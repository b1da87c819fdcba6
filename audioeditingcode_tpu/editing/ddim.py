"""Plain DDIM inversion / generation baseline as lax.scan loops.

(reference: code/ddm_inversion/ddim_inversion.py — deterministic DDIM
inversion x0 -> xT and prompt-guided eta=0 regeneration.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..schedulers import DiffusionSchedule, ddim_next_step, ddim_step
from .invert import DenoiseFn


def ddim_inversion_loop(
    sched: DiffusionSchedule,
    denoise_fn: DenoiseFn,
    w0: jnp.ndarray,
    skip: int = 0,
) -> jnp.ndarray:
    """x0 -> x_T via deterministic DDIM inversion (ddim_inversion.py:44-56).

    Runs S - skip steps, ascending timesteps (k = S-1 down to skip).
    """
    S = sched.num_inference_steps
    runs = S - skip

    def body(latent, i):
        k = S - 1 - i
        eps = denoise_fn(latent, k)
        return ddim_next_step(sched, k, eps, latent), None

    latent, _ = jax.lax.scan(body, w0, jnp.arange(runs))
    return latent


def ddim_generation_loop(
    sched: DiffusionSchedule,
    denoise_fn: DenoiseFn,
    xT: jnp.ndarray,
    skip: int = 0,
) -> jnp.ndarray:
    """x_T -> x0 via eta=0 DDIM sampling (ddim_inversion.py:59-84)."""
    S = sched.num_inference_steps

    def body(xt, k):
        eps = denoise_fn(xt, k)
        prev, _ = ddim_step(sched, k, eps, xt, eta=0.0)
        return prev, None

    xt, _ = jax.lax.scan(body, xT, jnp.arange(skip, S))
    return xt
