"""Image IO for the image-editing CLIs.

Host-side equivalent of the reference's ``load_image`` (reference:
code/utils.py:16-46): crop → center-square → resize → scale to [-1, 1],
NCHW float32. Saving mirrors ``to_pil_image`` on a [-1, 1] tensor.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def load_image(
    image_path,
    left: int = 0,
    right: int = 0,
    top: int = 0,
    bottom: int = 0,
    resize: Tuple[int, int] = (512, 512),
) -> np.ndarray:
    """Load an RGB image -> (1, 3, H, W) float32 in [-1, 1]."""
    if isinstance(image_path, str):
        from PIL import Image

        image = np.array(Image.open(image_path).convert("RGB"))[:, :, :3]
    else:
        image = image_path

    h, w, _ = image.shape
    left = min(left, w - 1)
    right = min(right, w - left - 1)
    top = min(top, h - left - 1)
    bottom = min(bottom, h - top - 1)
    image = image[top: h - bottom, left: w - right]
    h, w, _ = image.shape

    if h < w:
        offset = (w - h) // 2
        image = image[:, offset: offset + h]
    elif w < h:
        offset = (h - w) // 2
        image = image[offset: offset + w]

    from PIL import Image

    image = np.array(Image.fromarray(image).resize(resize))
    image = image.astype(np.float32) / 255.0
    image = np.transpose(image, (2, 0, 1))[None]  # (1, 3, H, W)
    return image * 2.0 - 1.0


def save_image(path: str, x: np.ndarray) -> None:
    """Save a (1, 3, H, W) or (3, H, W) [-1, 1] tensor as PNG."""
    from PIL import Image

    x = np.asarray(x)
    if x.ndim == 4:
        x = x[0]
    x = np.clip((x + 1.0) / 2.0, 0.0, 1.0)
    x = (np.transpose(x, (1, 2, 0)) * 255.0).round().astype(np.uint8)
    Image.fromarray(x).save(path)
