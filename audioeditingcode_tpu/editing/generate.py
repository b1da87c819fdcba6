"""Generation primitives: text-to-audio, style transfer, masked inpainting.

The capability surface of the reference's vendored standalone AudioLDM CLI
(reference: code/audioldm/pipeline.py:107-301 — ``text_to_audio``,
``style_transfer``, ``super_resolution_and_inpainting``), rebuilt on this
framework's pipeline seam as single ``lax.scan`` programs:

- text_to_audio: CFG-guided ancestral sampling from pure noise;
- style_transfer: noise the source latent to ``transfer_strength * S`` and
  denoise under the target prompt (the reference's stochastic_encode/decode,
  audioldm/latent_diffusion/ddim.py:307-377);
- inpaint: at every step re-project the known region to the correctly-noised
  source latent (mask in latent space — pipeline.py:248-286).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..schedulers import DiffusionSchedule, add_noise, ddim_step
from .invert import DenoiseFn


def generation_loop(
    sched: DiffusionSchedule,
    denoise_fn: DenoiseFn,
    shape,
    rng: jax.Array,
    eta: float = 1.0,
    skip: int = 0,
    init_xt: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Ancestral sampling from timesteps[skip] to 0.

    With ``init_xt`` the chain starts from a provided latent (style
    transfer); otherwise from N(0, I)."""
    S = sched.num_inference_steps
    runs = S - skip
    r_init, r_steps = jax.random.split(rng)
    xt = init_xt if init_xt is not None else jax.random.normal(r_init, shape)
    noises = jax.random.normal(r_steps, (runs,) + tuple(shape))

    def body(xt, inputs):
        k, z = inputs
        eps = denoise_fn(xt, k)
        xt, _ = ddim_step(sched, k, eps, xt, eta=eta, variance_noise=z)
        return xt, None

    xt, _ = jax.lax.scan(body, xt, (jnp.arange(skip, S), noises))
    return xt


def text_to_audio_latents(
    sched: DiffusionSchedule,
    denoise_fn: DenoiseFn,
    shape,
    rng: jax.Array,
    eta: float = 1.0,
) -> jnp.ndarray:
    """Full text-to-audio latent generation (pipeline.py:107-145)."""
    return generation_loop(sched, denoise_fn, shape, rng, eta=eta)


def style_transfer_latents(
    sched: DiffusionSchedule,
    denoise_fn: DenoiseFn,
    w0: jnp.ndarray,
    rng: jax.Array,
    transfer_strength: float,
    eta: float = 1.0,
) -> jnp.ndarray:
    """Noise w0 to t = strength * S, then denoise under the target prompt
    (pipeline.py:183-245 stochastic_encode + guided decode)."""
    S = sched.num_inference_steps
    t_enc = int(transfer_strength * S)
    if t_enc <= 0:  # zero strength: nothing to transfer
        return w0
    skip = S - t_enc
    r_noise, r_steps = jax.random.split(rng)
    noise = jax.random.normal(r_noise, w0.shape, dtype=w0.dtype)
    xt = add_noise(sched, w0, noise, sched.timesteps[skip])
    return generation_loop(sched, denoise_fn, w0.shape, r_steps, eta=eta,
                           skip=skip, init_xt=xt)


def inpaint_latents(
    sched: DiffusionSchedule,
    denoise_fn: DenoiseFn,
    w0: jnp.ndarray,
    mask: jnp.ndarray,  # 1 = regenerate, 0 = keep source
    rng: jax.Array,
    eta: float = 1.0,
) -> jnp.ndarray:
    """Masked generation: after every step the kept region is replaced by the
    source latent noised to the *next* timestep (pipeline.py:248-286)."""
    S = sched.num_inference_steps
    r_init, r_keep, r_steps = jax.random.split(rng, 3)
    xt = jax.random.normal(r_init, w0.shape, dtype=w0.dtype)
    keep_noise = jax.random.normal(r_keep, (S,) + tuple(w0.shape), dtype=w0.dtype)
    step_noise = jax.random.normal(r_steps, (S,) + tuple(w0.shape), dtype=w0.dtype)

    def body(xt, inputs):
        k, zk, zs = inputs
        eps = denoise_fn(xt, k)
        xt, _ = ddim_step(sched, k, eps, xt, eta=eta, variance_noise=zs)
        # re-project the kept region at the new (t - ratio) noise level
        t_prev = jnp.maximum(sched.timesteps[k] - sched.step_ratio, 0)
        w_known = add_noise(sched, w0, zk, t_prev)
        xt = mask * xt + (1.0 - mask) * w_known
        return xt, None

    xt, _ = jax.lax.scan(body, xt, (jnp.arange(S), keep_noise, step_noise))
    return mask * xt + (1.0 - mask) * w0


def inpaint_latents_cosine(
    solver,  # CosineDPMSolver
    eps_pair_fn,
    w0: jnp.ndarray,  # (B, C, L) clean Oobleck latent
    mask: jnp.ndarray,  # 1 = regenerate, 0 = keep source
    rng: jax.Array,
    cfg_tar: float,
    noises: jnp.ndarray = None,  # (S,) + w0.shape solver variance noise
) -> jnp.ndarray:
    """Masked generation on the sigma-space cosine solver (Stable Audio):
    after every solver step the kept region is re-projected to the source
    latent noised to the NEXT sigma level — the sigma-space analogue of
    ``inpaint_latents`` (reference pipeline.py:248-286 semantics).

    The 2nd-order history sees the pre-blend model output; the blend runs
    on the sample only, like the mel-space path.  ``noises`` overrides the
    solver variance noise with caller-supplied increments (Brownian tree,
    schedulers/brownian.py); the keep-region q-sample noise stays i.i.d.
    either way (it is forward noising, not solver noise)."""
    sched = solver.sched
    S = sched.num_inference_steps
    r_init, r_keep, r_steps = jax.random.split(rng, 3)
    xt = sched.sigmas[0] * jax.random.normal(r_init, w0.shape, dtype=w0.dtype)
    keep_noise = jax.random.normal(r_keep, (S,) + tuple(w0.shape), dtype=w0.dtype)
    step_noise = (jnp.asarray(noises, dtype=w0.dtype) if noises is not None
                  else jax.random.normal(r_steps, (S,) + tuple(w0.shape),
                                         dtype=w0.dtype))

    def body(carry, inputs):
        xt, state = carry
        k, zk, zs = inputs
        eps_u, eps_c = eps_pair_fn(xt, xt, k)
        noise_pred = eps_u + cfg_tar * (eps_c - eps_u)
        state, xt = solver.reverse_step(state, k, xt, noise_pred, zs)
        w_known = w0 + sched.sigmas[k + 1] * zk
        xt = mask * xt + (1.0 - mask) * w_known
        return (xt, state), None

    init = (xt, solver.init_state(xt))
    (xt, _), _ = jax.lax.scan(
        body, init, (jnp.arange(S), keep_noise, step_noise))
    return mask * xt + (1.0 - mask) * w0
