#!/usr/bin/env python
"""Standalone text-to-audio / style-transfer / inpainting CLI
(capability parity with the reference's `python -m audioldm`)."""
from audioeditingcode_tpu.cli.generate import main

if __name__ == "__main__":
    main()
