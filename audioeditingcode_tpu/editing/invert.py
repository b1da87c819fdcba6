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
  (inversion_utils.py:95-102, 307-315) are reproduced exactly;
- scheduler math is dispatched through the solver seam
  (:mod:`audioeditingcode_tpu.editing.solvers`): eta-DDIM for the
  AudioLDM/TANGO/SD families, 2nd-order SDE-DPM-Solver++ with scan-carried
  multistep history for Stable Audio (the reference threads that history via
  ``extra_info`` — inversion_utils.py:123-129,219).

The model is abstracted as ``denoise_fn(xt, k) -> noise_pred`` where k is
the step position in ``solver.timesteps``; input preconditioning
(scale_model_input, inversion_utils.py:79,226) happens inside the pipeline's
denoiser closure. Pipelines build these closures (models/pipeline.py) so the
editing math stays model-agnostic — the JAX analogue of the reference's
PipelineWrapper seam (SURVEY.md §1).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .solvers import as_solver

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
    sched,
    denoise_fn: DenoiseFn,
    x0: jnp.ndarray,  # (1, ...) reference NCHW latent
    rng: jax.Array,
    eta: float = 1.0,
    numerical_fix: bool = True,
    zero_first: bool = True,
    return_extras: bool = False,
    return_hspace: bool = False,
):
    """Forward (inversion) pass: returns (x_fix, zs, xts[, extras][, hspaces]).

    The first value is the FINAL scan carry — the numerically-fixed,
    nearly-clean latent at the end of the trajectory (NOT the noisiest
    x_T; start reverse passes from ``xts[tstart]``, which
    ``inversion_reverse_process`` does internally).

    With ``return_hspace`` the denoiser must return ``(eps, h_space)`` (build
    it with ``pipeline.make_hooked_denoiser(return_hspace=True)``); hspaces
    come back in step order k=0..S-1 (largest timestep first), matching the
    reference's extract_h_space stacking (inversion_utils.py:116-117,136-138).

    zs: (S, 1, ...) noise maps (zs[0] zeroed, reference inversion_utils.py:133);
    xts: (S+1, 1, ...) trajectory with xts[idx] rewritten to the
    numerically-fixed x_{t-1} values (inversion_utils.py:121-128);
    extras (multistep solvers, with ``return_extras=True``): (S, 1, ...) the
    per-step solver history in zs-index order — the reference's
    ``extra_info`` (inversion_utils.py:129), fed back to the reverse pass.
    """
    solver = as_solver(sched, eta=eta, numerical_fix=numerical_fix)
    S = solver.num_inference_steps
    xts = solver.sample_xts(x0, rng)  # (S+1, 1, ...)

    def body(carry, inputs):
        xt, state = carry
        k, xtm1_raw = inputs
        if return_hspace:
            eps, hsp = denoise_fn(xt, k)
        else:
            eps, hsp = denoise_fn(xt, k), ()
        state, z, xtm1_fix, extra = solver.forward_step(state, k, xt, xtm1_raw, eps)
        outputs = (z, xtm1_fix, extra) if solver.carries_history else (z, xtm1_fix)
        return (xtm1_fix, state), outputs + (hsp,)

    ks = jnp.arange(S)
    # iteration k handles idx = S-k-1: xt_in = xts[idx+1], target = xts[idx]
    xtm1_raws = jnp.flip(xts[:S], axis=0)
    xT = xts[S]
    init = (xT, solver.init_state(x0))
    (x_last, _), outs = jax.lax.scan(body, init, (ks, xtm1_raws))
    hspaces = outs[-1]  # (S, ...) in k order, or () placeholder
    outs = outs[:-1]
    if solver.carries_history:
        zs_k, xtm1_k, extras_k = outs
        extras = jnp.flip(extras_k, axis=0)
    else:
        zs_k, xtm1_k = outs
        extras = None

    zs = jnp.flip(zs_k, axis=0)  # to idx order
    if zero_first:
        zs = zs.at[0].set(jnp.zeros_like(zs[0]))
    new_xts = jnp.concatenate([jnp.flip(xtm1_k, axis=0), xts[S:]], axis=0)
    result = (x_last, zs, new_xts)
    if return_extras:
        result = result + (extras,)
    if return_hspace:
        result = result + (hspaces,)
    return result


def inversion_reverse_process(
    sched,
    denoise_fn: DenoiseFn,
    xts: jnp.ndarray,  # (>=T+1, 1, ...) trajectory from the forward pass
    zs: jnp.ndarray,  # (T, 1, ...) noise maps, T = tstart.max()
    eta: float = 1.0,
    tstart: Optional[jnp.ndarray] = None,  # (P,) int per-prompt start steps
    fix_alpha: float = 0.1,
    masks: Optional[jnp.ndarray] = None,  # (P, ...) smoothed prompt masks
    init_history: Optional[jnp.ndarray] = None,  # multistep warm start
    return_hspace: bool = False,
):
    """Reverse (editing) pass from x_{tstart.max()} using stored noise maps.

    Implements the loop of inversion_utils.py:221-315 including the
    multi-tstart mask fix: prompts with smaller tstart are blended toward
    the stored trajectory until their own start step is reached.

    ``init_history`` warm-starts a multistep solver with the forward pass's
    converted model output at step k0-1 (= ``extras[T-1]`` from
    :func:`inversion_forward_process`) — the reference's setup_extra_inputs
    Option 2 (models.py:1180-1184).
    """
    solver = as_solver(sched, eta=eta)
    T = zs.shape[0]
    S = solver.num_inference_steps
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

    def body(carry, inputs):
        xt, state = carry
        it, z, af_it, fix_target = inputs
        k = S - T + it
        if return_hspace:
            eps, hsp = denoise_fn(xt, k)
        else:
            eps, hsp = denoise_fn(xt, k), ()
        state, xt = solver.reverse_step(state, k, xt, eps, z)
        if multi:
            a = af_it.reshape((-1,) + (1,) * (xt.ndim - 1))  # (P, 1, 1, 1)
            blended = masks * (xt * (1.0 - a) + a * fix_target)
            xt = jnp.sum(blended, axis=0, keepdims=True)
        return (xt, state), hsp

    its = jnp.arange(T)
    zs_rev = jnp.flip(zs, axis=0)  # iteration order: idx = T-1 .. 0
    init = (xt, solver.init_state(xt, init_history))
    (xt, _), hspaces = jax.lax.scan(body, init, (its, zs_rev, af, fix_targets))
    if return_hspace:
        return xt, hspaces
    return xt
