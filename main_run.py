#!/usr/bin/env python
"""Text-based audio editing (CLI-compatible with the reference main_run.py)."""
from audioeditingcode_tpu.cli.run import main

if __name__ == "__main__":
    main()
