#!/usr/bin/env python
"""PC drift application (CLI-compatible with the reference main_pc_apply_drift.py)."""
from audioeditingcode_tpu.cli.pc_apply import main

if __name__ == "__main__":
    main()
