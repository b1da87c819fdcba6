"""Cosine DPM-Solver++ (2nd-order SDE) numerics for the Stable Audio family.

TPU-first re-design of the EDM/sigma-space inversion math the reference
implements inside ``StableAudWrapper`` on top of HF diffusers'
``CosineDPMSolverMultistepScheduler`` (reference: code/models.py:1190-1329 —
``sample_xts_from_x0``, ``get_zs_from_xts`` with first/second-order noise
recovery, ``reverse_step_with_custom_noise``; solver history threaded through
``extra_info``, code/ddm_inversion/inversion_utils.py:123-129,219).

Design: instead of a stateful scheduler object whose ``step_index`` /
``model_outputs`` / ``lower_order_nums`` mutate across calls, everything is a
pure function of

  - the precomputed :class:`CosineDPMSchedule` (sigmas / timesteps / per-step
    static order flags), and
  - an explicit :class:`SolverState` pytree (previous converted model output
    ``m1`` + its validity flag) carried through ``lax.scan``.

This makes the second-order multistep solver — the "stateful scheduler made
functional" problem SURVEY.md §7 ranks hardest — compile into the same
single-scan editing loops as the DDIM path.

Math (alpha_t == 1 throughout; sigma-space "VE"-style parameterisation):

  x_t ~ q(x_t|x_0):        x_t = x_0 + sigma_t * n
  preconditioning:          c_in  = 1 / sqrt(sigma^2 + sigma_data^2)
                            c_skip = sigma_data^2 / (sigma^2 + sigma_data^2)
                            c_out = -sigma * sigma_data / sqrt(sigma^2 + sigma_data^2)
                            (v-prediction; epsilon flips c_out's sign)
  1st-order SDE-DPM++:      h = log(sigma_s) - log(sigma_t)
      x_t = (sigma_t/sigma_s) e^{-h} x_s + (1 - e^{-2h}) D0
            + sigma_t sqrt(1 - e^{-2h}) z
  2nd-order (midpoint):     adds + 0.5 (1 - e^{-2h}) D1,
      D1 = (m0 - m1) / r0,  r0 = h_0 / h
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@dataclasses.dataclass(frozen=True)
class CosineDPMConfig:
    """Static config mirroring HF CosineDPMSolverMultistepScheduler fields
    (the stable-audio-open-1.0 checkpoint's scheduler/scheduler_config.json)."""

    sigma_min: float = 0.3
    sigma_max: float = 500.0
    sigma_data: float = 1.0
    sigma_schedule: str = "exponential"  # "exponential" | "karras"
    rho: float = 7.0
    solver_order: int = 2
    prediction_type: str = "v_prediction"  # "v_prediction" | "epsilon"
    lower_order_final: bool = True
    euler_at_final: bool = False
    final_sigmas_type: str = "zero"  # "zero" | "sigma_min"
    num_train_timesteps: int = 1000


class CosineDPMSchedule(struct.PyTreeNode):
    """Precomputed solver schedule for S inference steps.

    ``sigmas`` has S+1 entries (final entry 0 for final_sigmas_type='zero');
    ``timesteps[k] = atan(sigmas[k]) * 2/pi`` is the continuous time fed to
    the DiT. ``step_first_order[k]`` marks steps statically forced to first
    order (the final step under final_sigmas_type='zero', plus the
    lower_order_final small-S cases).
    """

    sigmas: jnp.ndarray  # (S+1,)
    timesteps: jnp.ndarray  # (S,) float32
    step_first_order: jnp.ndarray  # (S,) bool
    step_zero_noise: jnp.ndarray  # (S,) bool — z forced to 0 (sigma_t == 0)
    sigma_data: float = struct.field(pytree_node=False, default=1.0)
    prediction_type: str = struct.field(pytree_node=False, default="v_prediction")
    solver_order: int = struct.field(pytree_node=False, default=2)
    num_inference_steps: int = struct.field(pytree_node=False, default=100)


def make_cosine_dpm_schedule(
    config: CosineDPMConfig, num_inference_steps: int, dtype=jnp.float32
) -> CosineDPMSchedule:
    """set_timesteps equivalent: sigma grid + per-step static order flags."""
    S = num_inference_steps
    if config.sigma_schedule == "exponential":
        sigmas = np.exp(
            np.linspace(np.log(config.sigma_max), np.log(config.sigma_min), S)
        )
    elif config.sigma_schedule == "karras":
        ramp = np.linspace(0.0, 1.0, S)
        rho = config.rho
        min_inv, max_inv = config.sigma_min ** (1 / rho), config.sigma_max ** (1 / rho)
        sigmas = (max_inv + ramp * (min_inv - max_inv)) ** rho
    else:
        raise ValueError(f"unknown sigma schedule: {config.sigma_schedule}")

    timesteps = np.arctan(sigmas) / np.pi * 2.0

    if config.final_sigmas_type == "zero":
        sigma_last = 0.0
    elif config.final_sigmas_type == "sigma_min":
        sigma_last = sigmas[-1]
    else:
        raise ValueError(config.final_sigmas_type)
    sigmas = np.concatenate([sigmas, [sigma_last]])

    # static order flags (reference: models.py:1222-1227)
    k = np.arange(S)
    lower_order_final = (k == S - 1) & (
        config.euler_at_final
        or (config.lower_order_final and S < 15)
        or config.final_sigmas_type == "zero"
    )
    step_first_order = lower_order_final | (config.solver_order == 1)
    step_zero_noise = (k == S - 1) & (config.final_sigmas_type == "zero")

    return CosineDPMSchedule(
        sigmas=jnp.asarray(sigmas, dtype=dtype),
        timesteps=jnp.asarray(timesteps, dtype=jnp.float32),
        step_first_order=jnp.asarray(step_first_order),
        step_zero_noise=jnp.asarray(step_zero_noise),
        sigma_data=config.sigma_data,
        prediction_type=config.prediction_type,
        solver_order=config.solver_order,
        num_inference_steps=S,
    )


# ---------------------------------------------------------------------------
# Preconditioning (EDM c_in / c_skip / c_out)
# ---------------------------------------------------------------------------


def scale_model_input(sched: CosineDPMSchedule, k, sample: jnp.ndarray) -> jnp.ndarray:
    """c_in * sample — what the DiT actually consumes
    (diffusers scale_model_input; called at inversion_utils.py:79,226)."""
    sigma = sched.sigmas[k]
    return sample / jnp.sqrt(sigma ** 2 + sched.sigma_data ** 2)


def convert_model_output(
    sched: CosineDPMSchedule, k, sample: jnp.ndarray, model_output: jnp.ndarray
) -> jnp.ndarray:
    """Raw DiT output -> denoised x0 prediction (diffusers precondition_outputs).

    ``sample`` is the *unscaled* latent (reference: models.py:1229,1300 pass
    the raw xt)."""
    sigma = sched.sigmas[k]
    sd = sched.sigma_data
    c_skip = sd ** 2 / (sigma ** 2 + sd ** 2)
    c_out = sigma * sd / jnp.sqrt(sigma ** 2 + sd ** 2)
    if sched.prediction_type == "v_prediction":
        c_out = -c_out
    elif sched.prediction_type != "epsilon":
        raise ValueError(sched.prediction_type)
    return c_skip * sample + c_out * model_output


# ---------------------------------------------------------------------------
# Solver state + updates
# ---------------------------------------------------------------------------


class SolverState(struct.PyTreeNode):
    """Multistep history carried through a scan: the previous step's converted
    model output m1 and whether it is valid (lower_order_nums >= 1)."""

    m1: jnp.ndarray
    m1_valid: jnp.ndarray  # bool scalar


def init_solver_state(
    like: jnp.ndarray, m1: Optional[jnp.ndarray] = None
) -> SolverState:
    """Fresh state (start of a full run) or warm state from the forward pass's
    history (the reference's setup_extra_inputs Option 2, models.py:1180-1184).

    The history lives in SOLVER space: every in-scan update promotes to the
    schedule's float32 (f32 sigmas x latent), so the state must be created
    in that promoted dtype too — initializing at a bfloat16 latent's dtype
    desynchronizes the scan carry (input m1 bf16, output m1 f32) and fails
    scan's carry type check (hit by the CLI's --dtype bfloat16 Stable Audio
    path, whose Oobleck vae_encode emits bf16 latents)."""
    dtype = jnp.promote_types(like.dtype, jnp.float32)
    if m1 is None:
        return SolverState(m1=jnp.zeros_like(like, dtype=dtype),
                           m1_valid=jnp.asarray(False))
    return SolverState(m1=m1.astype(dtype), m1_valid=jnp.asarray(True))


def _updates(sched: CosineDPMSchedule, k, sample, m0, m1, noise):
    """Both solver updates at step k; callers select via use_first.

    Returns (x_first, x_second). sigma indices: t=k+1, s0=k, s1=k-1
    (k-1 clamped; the second-order result is only selected when valid)."""
    sigma_t = sched.sigmas[k + 1]
    sigma_s0 = sched.sigmas[k]
    sigma_s1 = sched.sigmas[jnp.maximum(k - 1, 0)]

    # guard sigma_t == 0 (final step): h -> inf, e^{-h} -> 0; compute with a
    # safe sigma and fix the degenerate terms by limit value.
    zero_t = sigma_t <= 0.0
    sigma_t_safe = jnp.where(zero_t, 1.0, sigma_t)

    h = jnp.log(sigma_s0) - jnp.log(sigma_t_safe)
    ratio = jnp.where(zero_t, 0.0, (sigma_t_safe / sigma_s0) * jnp.exp(-h))
    one_m = jnp.where(zero_t, 1.0, 1.0 - jnp.exp(-2.0 * h))
    noise_coef = jnp.where(zero_t, 0.0, sigma_t_safe * jnp.sqrt(jnp.abs(one_m)))

    x_first = ratio * sample + one_m * m0 + noise_coef * noise

    h0 = jnp.log(sigma_s1) - jnp.log(sigma_s0)
    r0 = jnp.where(h == 0.0, 1.0, h0 / h)
    d1 = jnp.where(r0 == 0.0, 0.0, (m0 - m1) / jnp.where(r0 == 0.0, 1.0, r0))
    x_second = x_first + 0.5 * one_m * d1
    return x_first, x_second


def solver_step_from_x0(
    sched: CosineDPMSchedule,
    state: SolverState,
    k,
    m0: jnp.ndarray,
    sample: jnp.ndarray,
    noise: jnp.ndarray,
) -> Tuple[SolverState, jnp.ndarray]:
    """One SDE-DPM-Solver++ step from an ALREADY-CONVERTED x0 prediction m0
    (the drift-application path shifts m0 directly, the analogue of the
    DDIM apply_drift recompute, reference pc_drift.py:239-276)."""
    noise = jnp.where(sched.step_zero_noise[k], jnp.zeros_like(noise), noise)
    x_first, x_second = _updates(sched, k, sample, m0, state.m1, noise)
    use_first = sched.step_first_order[k] | ~state.m1_valid
    prev = jnp.where(use_first, x_first, x_second)
    return SolverState(m1=m0, m1_valid=jnp.asarray(True)), prev


def solver_step(
    sched: CosineDPMSchedule,
    state: SolverState,
    k,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    noise: jnp.ndarray,
) -> Tuple[SolverState, jnp.ndarray]:
    """One SDE-DPM-Solver++ step x_k -> x_{k+1} with external noise.

    (reference: models.py:1282-1329 reverse_step_with_custom_noise — raw
    model output in, converted internally, history shifted.)"""
    m0 = convert_model_output(sched, k, sample, model_output)
    return solver_step_from_x0(sched, state, k, m0, sample, noise)


def recover_noise(
    sched: CosineDPMSchedule,
    state: SolverState,
    k,
    xt: jnp.ndarray,
    xtm1: jnp.ndarray,
    model_output: jnp.ndarray,
    numerical_fix: bool = True,
) -> Tuple[SolverState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Solve the SDE-DPM++ update for the noise z mapping x_k -> target x_{k+1}.

    Returns (state', z, xtm1_fixed, extra) where extra is the *previous*
    converted output (the reference's third return, models.py:1271 — consumed
    as reverse-pass warm history via extra_info).
    """
    m0 = convert_model_output(sched, k, xt, model_output)
    m1 = state.m1

    sigma_t = sched.sigmas[k + 1]
    sigma_s0 = sched.sigmas[k]
    zero_t = sigma_t <= 0.0
    sigma_t_safe = jnp.where(zero_t, 1.0, sigma_t)
    h = jnp.log(sigma_s0) - jnp.log(sigma_t_safe)
    ratio = (sigma_t_safe / sigma_s0) * jnp.exp(-h)
    one_m = 1.0 - jnp.exp(-2.0 * h)
    denom = sigma_t_safe * jnp.sqrt(jnp.abs(one_m))

    use_first = sched.step_first_order[k] | ~state.m1_valid

    # second-order D1 correction (reference: models.py:1242-1255)
    sigma_s1 = sched.sigmas[jnp.maximum(k - 1, 0)]
    h0 = jnp.log(sigma_s1) - jnp.log(sigma_s0)
    r0 = jnp.where(h == 0.0, 1.0, h0 / h)
    d1 = (m0 - m1) / jnp.where(r0 == 0.0, 1.0, r0)
    correction = jnp.where(use_first, 0.0, 0.5 * one_m * d1)

    z = (xtm1 - ratio * xt - one_m * m0 - correction) / denom
    z = jnp.where(zero_t, jnp.zeros_like(z), z)

    if numerical_fix:
        x_first, x_second = _updates(sched, k, xt, m0, m1, z)
        xtm1 = jnp.where(use_first, x_first, x_second)

    new_state = SolverState(m1=m0, m1_valid=jnp.asarray(True))
    return new_state, z, xtm1, m1


# ---------------------------------------------------------------------------
# Trajectory sampling
# ---------------------------------------------------------------------------


def sample_xts_from_x0_sigma(
    sched: CosineDPMSchedule, x0: jnp.ndarray, rng: jax.Array
) -> jnp.ndarray:
    """Independent q(x_t|x_0) samples: x_t = x_0 + sigma_t * n.

    (reference: models.py:1190-1207.) Returns (S+1, *x0.shape): index
    idx = S - k holds the sample at sigmas[k]; xts[0] = x0."""
    S = sched.num_inference_steps
    noise = jax.random.normal(rng, (S,) + x0.shape, dtype=x0.dtype)
    expand = (S,) + (1,) * x0.ndim
    scaled = x0[None] + sched.sigmas[:S].reshape(expand) * noise
    return jnp.concatenate([x0[None], jnp.flip(scaled, axis=0)], axis=0)
