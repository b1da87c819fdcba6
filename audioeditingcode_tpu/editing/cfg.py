"""Per-prompt spatial classifier-free-guidance tensors.

Reproduces the reference's multi-prompt CFG semantics exactly
(code/ddm_inversion/inversion_utils.py:28-51, 177-200): the time axis
(axis 2 of the NCHW latent) is partitioned at ``cutoff_points`` into one
segment per prompt, each segment scaled by that prompt's CFG strength
(zeroed for empty prompts on the forward pass), then smoothed with a
15x15 sigma-1 gaussian blur.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from ..ops.filters import gaussian_blur_2d


def build_cfg_tensors(
    latent_shape: Sequence[int],  # (1, C, H, W) or (1, C, L) reference layout
    prompts: List[str],
    cfg_scales: List[float],
    cutoff_points: Optional[List[float]] = None,
    zero_empty_prompts: bool = False,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (cfg_scales_tensor, masks), each (P, *latent_shape[1:]).

    For P == 1 the cfg tensor is a constant cfg_scales[0] and the mask all
    ones (no blur), matching the reference's single-prompt branch.
    """
    batch = len(prompts)
    inner = tuple(latent_shape[1:])
    if len(cfg_scales) == 1:
        cfg_scales = list(cfg_scales) * batch
    elif len(cfg_scales) < batch:
        raise ValueError("Not enough target CFG scales")

    if batch == 1:
        scale = 0.0 if (zero_empty_prompts and prompts[0] == "") else cfg_scales[0]
        cfg = jnp.full((1,) + inner, scale, dtype=dtype)
        masks = jnp.ones((1,) + inner, dtype=dtype)
        return cfg, masks

    if cutoff_points is None:
        cutoff_points = [i / batch for i in range(1, batch)]
    # axis 2 of the full NCHW tensor == axis 1 of the per-prompt slice
    time_dim = inner[1]
    cuts = [int(x * time_dim) for x in cutoff_points]
    cuts = [0, *cuts, time_dim]

    cfg_np = np.ones((batch,) + inner, dtype=np.float32)
    mask_np = np.ones((batch,) + inner, dtype=np.float32)
    for i, (start, end) in enumerate(zip(cuts[:-1], cuts[1:])):
        cfg_np[i, :, end:] = 0
        cfg_np[i, :, :start] = 0
        mask_np[i, :, end:] = 0
        mask_np[i, :, :start] = 0
        cfg_np[i] *= cfg_scales[i]
        if zero_empty_prompts and prompts[i] == "":
            cfg_np[i] = 0

    cfg = gaussian_blur_2d(jnp.asarray(cfg_np, dtype=dtype), 15, 1.0)
    masks = gaussian_blur_2d(jnp.asarray(mask_np, dtype=dtype), 15, 1.0)
    return cfg, masks
