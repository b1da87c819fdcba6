#!/usr/bin/env python
"""Long-form text-based editing CLI: chunk -> batched edit -> crossfade.

New capability beyond the reference (which bounds editable duration by the
model's sample_size — SURVEY §5). See audioeditingcode_tpu/cli/run_long.py.
"""

from audioeditingcode_tpu.cli.run_long import main

if __name__ == "__main__":
    main()
