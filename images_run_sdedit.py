#!/usr/bin/env python
"""Image SDEdit baseline (CLI-compatible with the reference images_run_sdedit.py)."""
from audioeditingcode_tpu.cli.images import sdedit_main as main

if __name__ == "__main__":
    main()
