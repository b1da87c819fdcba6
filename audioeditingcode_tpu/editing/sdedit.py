"""SDEdit baseline: noise to t_start, denoise with the target prompt.

(reference: code/main_run_sdedit.py:79-100 — latents pre-sampled per step,
loop via forward_directional with eta=1.)

``sdedit_loop_cosine`` extends the baseline to the Stable Audio family
(the reference's forward_directional is DDIM-bound — pc_drift.py:42,90 use
``alphas_cumprod`` and ``scheduler.step(eta=...)`` — so upstream SDEdit
cannot run that family at all): x_t = w0 + sigma_t * n, then 2nd-order
SDE-DPM-Solver++ steps with fresh per-step noise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..schedulers import DiffusionSchedule, add_noise
from .pc_drift import EpsPairFn, forward_directional
from .solvers import CosineDPMSolver


def sdedit_loop(
    sched: DiffusionSchedule,
    eps_pair_fn: EpsPairFn,
    w0: jnp.ndarray,  # (1, ...) clean latent
    rng: jax.Array,
    skip: int,
    cfg_tar: float,
    eta: float = 1.0,
) -> jnp.ndarray:
    """Noise w0 to timesteps[skip], then run the guided reverse process."""
    S = sched.num_inference_steps
    runs = S - skip
    k_noise, k_lat = jax.random.split(rng)

    noise = jax.random.normal(k_noise, w0.shape, dtype=w0.dtype)
    xt = add_noise(sched, w0, noise, sched.timesteps[skip])

    # per-step variance noise, pre-sampled like the reference (:79-87;
    # init_noise_sigma == 1 for DDIM so no extra scaling)
    latents = jax.random.normal(k_lat, (runs,) + w0.shape, dtype=w0.dtype)

    def body(xt, inputs):
        k, latent = inputs
        xt, _ = forward_directional(
            sched, eps_pair_fn, xt, k, latent, cfg_tar, eta=eta
        )
        return xt, None

    xt, _ = jax.lax.scan(body, xt, (jnp.arange(skip, S), latents))
    return xt


def sdedit_loop_cosine(
    solver: CosineDPMSolver,
    eps_pair_fn: EpsPairFn,
    w0: jnp.ndarray,
    rng: jax.Array,
    skip: int,
    cfg_tar: float,
    noises: jnp.ndarray = None,  # (S - skip,) + w0.shape variance noise
) -> jnp.ndarray:
    """SDEdit on the sigma-space cosine solver (Stable Audio family).

    ``noises`` overrides the per-step variance noise — the CLIs pass
    Brownian-tree increments here (schedulers/brownian.py) to match the
    reference's generation-mode sampler (models.py:1305-1312); ``None``
    keeps i.i.d. Gaussians (marginally identical)."""
    sched = solver.sched
    S = sched.num_inference_steps
    runs = S - skip
    k_noise, k_lat = jax.random.split(rng)

    noise = jax.random.normal(k_noise, w0.shape, dtype=w0.dtype)
    xt = w0 + sched.sigmas[skip] * noise
    latents = (jnp.asarray(noises, dtype=w0.dtype) if noises is not None
               else jax.random.normal(k_lat, (runs,) + w0.shape,
                                      dtype=w0.dtype))

    def body(carry, inputs):
        xt, state = carry
        k, z = inputs
        eps_u, eps_c = eps_pair_fn(xt, xt, k)
        noise_pred = eps_u + cfg_tar * (eps_c - eps_u)
        state, xt = solver.reverse_step(state, k, xt, noise_pred, z)
        return (xt, state), None

    init = (xt, solver.init_state(xt))
    (xt, _), _ = jax.lax.scan(body, init, (jnp.arange(skip, S), latents))
    return xt
