#!/usr/bin/env python
"""PC extraction (CLI-compatible with the reference main_pc_extract_inv.py)."""
from audioeditingcode_tpu.cli.pc_extract import main

if __name__ == "__main__":
    main()
