#!/usr/bin/env python
"""Evaluation-sweep CLI: one inversion, many (tstart, cfg_tar) edits.

The reference workflow re-runs the full inversion for every grid point of
its SupEval sweep; here the noise maps and trajectory are computed once
(see audioeditingcode_tpu/cli/sweep.py).
"""

from audioeditingcode_tpu.cli.sweep import main

if __name__ == "__main__":
    main()
