"""SDEdit baseline: noise to t_start, denoise with the target prompt.

(reference: code/main_run_sdedit.py:79-100 — latents pre-sampled per step,
loop via forward_directional with eta=1.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..schedulers import DiffusionSchedule, add_noise
from .pc_drift import EpsPairFn, forward_directional


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
