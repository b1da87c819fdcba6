"""Small image filters needed by the editing algorithms.

The multi-prompt spatial-CFG path gaussian-blurs the per-prompt CFG masks
(reference: ddm_inversion/inversion_utils.py:49,197-198 via
torchvision.transforms.functional.gaussian_blur, kernel_size=15, sigma=1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel1d(kernel_size: int, sigma: float) -> np.ndarray:
    """torchvision's 1-D gaussian kernel: exp(-x²/2σ²) normalized to sum 1."""
    x = np.linspace(-(kernel_size - 1) * 0.5, (kernel_size - 1) * 0.5, kernel_size)
    pdf = np.exp(-0.5 * (x / sigma) ** 2)
    return (pdf / pdf.sum()).astype(np.float32)


@partial(jax.jit, static_argnames=("kernel_size", "sigma"))
def gaussian_blur_2d(x: jnp.ndarray, kernel_size: int = 15, sigma: float = 1.0):
    """Separable gaussian blur over the last two dims with reflect padding.

    Matches torchvision.transforms.functional.gaussian_blur semantics for a
    square kernel. Works on any (..., H, W) input.
    """
    k = jnp.asarray(_gaussian_kernel1d(kernel_size, sigma), dtype=x.dtype)
    pad = kernel_size // 2

    batch_shape = x.shape[:-2]
    h, w = x.shape[-2:]
    xr = x.reshape((-1, h, w))

    # blur along H
    xp = jnp.pad(xr, [(0, 0), (pad, pad), (0, 0)], mode="reflect")
    idx = np.arange(h)[:, None] + np.arange(kernel_size)[None, :]
    xh = jnp.einsum("bhkw,k->bhw", xp[:, idx, :], k)
    # blur along W
    xp = jnp.pad(xh, [(0, 0), (0, 0), (pad, pad)], mode="reflect")
    idx = np.arange(w)[:, None] + np.arange(kernel_size)[None, :]
    xw = jnp.einsum("bhwk,k->bhw", xp[:, :, idx], k)

    return xw.reshape(batch_shape + (h, w))
