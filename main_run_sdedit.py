#!/usr/bin/env python
"""SDEdit baseline (CLI-compatible with the reference main_run_sdedit.py)."""
from audioeditingcode_tpu.cli.sdedit import main

if __name__ == "__main__":
    main()
