#!/usr/bin/env python
"""Image PC extraction (CLI-compatible with the reference images_pc_extract_inv.py)."""
from audioeditingcode_tpu.cli.images import pc_extract_main as main

if __name__ == "__main__":
    main()
