#!/usr/bin/env python
"""Production-style inference server for text-based audio editing."""
from audioeditingcode_tpu.serve import main

if __name__ == "__main__":
    main()
