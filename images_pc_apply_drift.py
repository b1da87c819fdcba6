#!/usr/bin/env python
"""Image PC drift application (CLI-compatible with the reference images_pc_apply_drift.py)."""
from audioeditingcode_tpu.cli.images import pc_apply_main as main

if __name__ == "__main__":
    main()
