#!/usr/bin/env python
"""Batched multi-clip text-based editing CLI: every clip in a directory is
edited in ONE vmapped program (clip axis sharded over 'dp').

New capability beyond the reference (one clip per main_run.py process).
See audioeditingcode_tpu/cli/run_batch.py.
"""

from audioeditingcode_tpu.cli.run_batch import main

if __name__ == "__main__":
    main()
