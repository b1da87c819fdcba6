#!/usr/bin/env python
"""Evaluation runner (script form of the reference's evals/ notebooks)."""
from audioeditingcode_tpu.cli.evals_run import main

if __name__ == "__main__":
    main()
