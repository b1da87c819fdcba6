"""Edit-friendly DDPM inversion as single-scan TPU programs.

Re-design of the reference's Python-loop editing core
(code/ddm_inversion/inversion_utils.py:8-323):

- the forward (inversion) pass and the reverse (editing) pass each compile
  to ONE ``lax.scan`` over timesteps; the full trajectory ``xts`` (S+1
  latents) and noise maps ``zs`` (S latents) live in HBM as scan inputs /
  outputs — no host round-trips inside the loop;
- cond/uncond classifier-free guidance is fused into a single batched UNet
  forward per step (the reference issues two sequential calls —
  inversion_utils.py:82-93 — batching them is the free 2x identified in
  SURVEY.md §6);
- the per-prompt spatial CFG tensors and the multi-tstart mask fix
  (inversion_utils.py:95-102, 307-315) are reproduced exactly.

The model is abstracted as ``denoise_fn(xt, k) -> noise_pred`` where k is
the step position in ``sched.timesteps``. Pipelines build these closures
(models/pipeline.py) so the editing math stays model-agnostic — the JAX
analogue of the reference's PipelineWrapper seam (SURVEY.md §1).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..schedulers import (
    DiffusionSchedule,
    get_zs_from_xts,
    reverse_step_with_custom_noise,
    sample_xts_from_x0,
)

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]  # (xt, k) -> eps


def make_cfg_denoiser(
    eps_pair_fn,
    cfg_tensor: Optional[jnp.ndarray],  # (P, *latent[1:]) or None for uncond-only
) -> DenoiseFn:
    """Classifier-free-guidance denoiser.

    noise_pred = eps_u + sum_p cfg[p] * (eps_c[p] - eps_u)
    (reference: inversion_utils.py:95-102, 274-281 — the sum over prompts
    with per-prompt spatial cfg tensors.)
    """

    if cfg_tensor is None:
        def denoise_uncond(xt, k):
            eps_u, _ = eps_pair_fn(xt, None, k)
            return eps_u

        return denoise_uncond

    def denoise(xt, k):
        eps_u, eps_c = eps_pair_fn(xt, xt, k)
        diff = cfg_tensor * (eps_c - eps_u)  # (P, ...)
        return eps_u + jnp.sum(diff, axis=0, keepdims=True)

    return denoise


def inversion_forward_process(
    sched: DiffusionSchedule,
    denoise_fn: DenoiseFn,
    x0: jnp.ndarray,  # (1, ...) reference NCHW latent
    rng: jax.Array,
    eta: float = 1.0,
    numerical_fix: bool = True,
    zero_first: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Forward (inversion) pass: returns (xT, zs, xts).

    zs: (S, 1, ...) noise maps (zs[0] zeroed, reference inversion_utils.py:133);
    xts: (S+1, 1, ...) trajectory with xts[idx] rewritten to the
    numerically-fixed x_{t-1} values (inversion_utils.py:121-128).
    """
    S = sched.num_inference_steps
    xts = sample_xts_from_x0(sched, x0, rng)  # (S+1, 1, ...)

    def body(xt, inputs):
        k, xtm1_raw = inputs
        eps = denoise_fn(xt, k)
        z, xtm1_fix = get_zs_from_xts(
            sched, k, xt, xtm1_raw, eps, eta=eta, numerical_fix=numerical_fix
        )
        return xtm1_fix, (z, xtm1_fix)

    ks = jnp.arange(S)
    # iteration k handles idx = S-k-1: xt_in = xts[idx+1], target = xts[idx]
    xtm1_raws = jnp.flip(xts[:S], axis=0)
    xT = xts[S]
    x_last, (zs_k, xtm1_k) = jax.lax.scan(body, xT, (ks, xtm1_raws))

    zs = jnp.flip(zs_k, axis=0)  # to idx order
    if zero_first:
        zs = zs.at[0].set(jnp.zeros_like(zs[0]))
    new_xts = jnp.concatenate([jnp.flip(xtm1_k, axis=0), xts[S:]], axis=0)
    return x_last, zs, new_xts


def inversion_reverse_process(
    sched: DiffusionSchedule,
    denoise_fn: DenoiseFn,
    xts: jnp.ndarray,  # (>=T+1, 1, ...) trajectory from the forward pass
    zs: jnp.ndarray,  # (T, 1, ...) noise maps, T = tstart.max()
    eta: float = 1.0,
    tstart: Optional[jnp.ndarray] = None,  # (P,) int per-prompt start steps
    fix_alpha: float = 0.1,
    masks: Optional[jnp.ndarray] = None,  # (P, ...) smoothed prompt masks
) -> jnp.ndarray:
    """Reverse (editing) pass from x_{tstart.max()} using stored noise maps.

    Implements the loop of inversion_utils.py:221-315 including the
    multi-tstart mask fix: prompts with smaller tstart are blended toward
    the stored trajectory until their own start step is reached.
    """
    T = zs.shape[0]
    S = sched.num_inference_steps
    xt = xts[T]

    multi = tstart is not None and masks is not None and masks.shape[0] > 1
    if multi:
        its = jnp.arange(T)[:, None]  # (T, 1)
        apply_fix = ((jnp.max(tstart) - tstart)[None, :] > its).astype(xt.dtype)
        af = apply_fix * fix_alpha  # (T, P)
        fix_targets = jnp.flip(xts[:T], axis=0)  # xts[T-1], ..., xts[0]
    else:
        af = jnp.zeros((T, 1), dtype=xt.dtype)
        fix_targets = jnp.zeros((T,) + xt.shape, dtype=xt.dtype)

    def body(xt, inputs):
        it, z, af_it, fix_target = inputs
        k = S - T + it
        eps = denoise_fn(xt, k)
        xt = reverse_step_with_custom_noise(
            sched, k, eps, xt, variance_noise=z, eta=eta
        )
        if multi:
            a = af_it.reshape((-1,) + (1,) * (xt.ndim - 1))  # (P, 1, 1, 1)
            blended = masks * (xt * (1.0 - a) + a * fix_target)
            xt = jnp.sum(blended, axis=0, keepdims=True)
        return xt, None

    its = jnp.arange(T)
    zs_rev = jnp.flip(zs, axis=0)  # iteration order: idx = T-1 .. 0
    xt, _ = jax.lax.scan(body, xt, (its, zs_rev, af, fix_targets))
    return xt
