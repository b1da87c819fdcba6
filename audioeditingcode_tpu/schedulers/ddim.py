"""DDIM/DDPM diffusion numerics as stateless pure functions.

TPU-first re-design of the scheduler math embedded in the reference's
``PipelineWrapper`` (reference: code/models.py:25-158) and the HF diffusers
``DDIMScheduler`` semantics it relies on (set_timesteps / alphas_cumprod /
_get_variance / step).

Instead of a stateful scheduler object, everything is precomputed once into a
:class:`DiffusionSchedule` pytree. Per-step coefficients are stored as arrays
aligned with the inference-timestep axis so that editing loops compile to a
single ``lax.scan`` that only does O(1) array indexing per step — no Python
dict lookups, no dynamic shapes, no host sync.

All math is float64-free float32 (configurable), matching the reference's
default ``double_precision=False`` path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@dataclasses.dataclass(frozen=True)
class DDIMConfig:
    """Static scheduler configuration (mirrors HF DDIMScheduler config fields).

    The per-model values shipped in :mod:`audioeditingcode_tpu.models.configs`
    mirror the public HF checkpoint configs the reference loads at runtime
    (reference: code/models.py:481,567,908,1010).
    """

    num_train_timesteps: int = 1000
    beta_start: float = 0.0015
    beta_end: float = 0.0195
    beta_schedule: str = "scaled_linear"  # "linear" | "scaled_linear" | "squaredcos_cap_v2"
    prediction_type: str = "epsilon"  # "epsilon" | "v_prediction"
    set_alpha_to_one: bool = False
    steps_offset: int = 1
    timestep_spacing: str = "leading"  # "leading" | "trailing" | "linspace"


def make_betas(config: DDIMConfig) -> np.ndarray:
    """Beta schedule, identical to diffusers' DDIMScheduler constructor."""
    n = config.num_train_timesteps
    if config.beta_schedule == "linear":
        betas = np.linspace(config.beta_start, config.beta_end, n, dtype=np.float64)
    elif config.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(config.beta_start ** 0.5, config.beta_end ** 0.5, n, dtype=np.float64) ** 2
        )
    elif config.beta_schedule == "squaredcos_cap_v2":
        # alpha_bar(t) = cos((t + 0.008) / 1.008 * pi / 2) ** 2
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

        ts = np.arange(n, dtype=np.float64)
        betas = np.minimum(1.0 - alpha_bar((ts + 1) / n) / alpha_bar(ts / n), 0.999)
    else:
        raise ValueError(f"unknown beta schedule: {config.beta_schedule}")
    return betas.astype(np.float64)


def _make_timesteps(config: DDIMConfig, num_inference_steps: int) -> np.ndarray:
    """Inference timestep grid, descending — diffusers DDIMScheduler.set_timesteps."""
    n = config.num_train_timesteps
    s = num_inference_steps
    if s > n:
        raise ValueError(f"num_inference_steps ({s}) > num_train_timesteps ({n})")
    if config.timestep_spacing == "linspace":
        timesteps = np.linspace(0, n - 1, s).round()[::-1].astype(np.int64)
    elif config.timestep_spacing == "leading":
        step_ratio = n // s
        timesteps = (np.arange(0, s) * step_ratio).round()[::-1].astype(np.int64)
        timesteps = timesteps + config.steps_offset
    elif config.timestep_spacing == "trailing":
        step_ratio = n / s
        timesteps = np.round(np.arange(n, 0, -step_ratio)).astype(np.int64) - 1
    else:
        raise ValueError(f"unknown timestep spacing: {config.timestep_spacing}")
    return timesteps


class DiffusionSchedule(struct.PyTreeNode):
    """Precomputed diffusion schedule.

    Array fields are jnp arrays (leaves); static fields are aux data. The
    ``step_*`` arrays are indexed by *step position* ``k`` in ``timesteps``
    (k=0 is the largest timestep), which is what the scan-based editing loops
    use. ``alphas_cumprod`` stays full-length for parity checks and for
    ``add_noise`` with arbitrary train timesteps.
    """

    alphas_cumprod: jnp.ndarray  # (num_train,)
    final_alpha_cumprod: jnp.ndarray  # scalar
    timesteps: jnp.ndarray  # (S,) int32, descending
    # Per-step-position coefficient arrays, aligned with `timesteps`:
    step_alpha_prod: jnp.ndarray  # (S,)  alpha_bar[timesteps[k]]
    step_alpha_prod_prev: jnp.ndarray  # (S,)  alpha_bar[timesteps[k] - ratio] (or final)
    step_variance: jnp.ndarray  # (S,)  DDIM variance at step k
    step_sigma: jnp.ndarray  # (S,)  sqrt(1/alpha_bar - 1) at timesteps[k]

    num_train_timesteps: int = struct.field(pytree_node=False, default=1000)
    num_inference_steps: int = struct.field(pytree_node=False, default=50)
    prediction_type: str = struct.field(pytree_node=False, default="epsilon")

    @property
    def step_ratio(self) -> int:
        return self.num_train_timesteps // self.num_inference_steps


def make_schedule(
    config: DDIMConfig, num_inference_steps: int, dtype=jnp.float32
) -> DiffusionSchedule:
    """Build a :class:`DiffusionSchedule` (diffusers set_timesteps equivalent).

    Reference semantics replicated:
      - alphas_cumprod = cumprod(1 - betas)                (DDIMScheduler.__init__)
      - final_alpha_cumprod = alphas_cumprod[0] or 1.0     (set_alpha_to_one)
      - variance = (beta_prev / beta) * (1 - a/a_prev)     (models.py:539-545)
      - sigma(t) = sqrt(1/alpha_bar[t] - 1)                (models.py:25-27)
    """
    betas = make_betas(config)
    alphas_cumprod = np.cumprod(1.0 - betas)
    final_alpha_cumprod = 1.0 if config.set_alpha_to_one else alphas_cumprod[0]
    timesteps = _make_timesteps(config, num_inference_steps)

    ratio = config.num_train_timesteps // num_inference_steps
    prev_timesteps = timesteps - ratio
    alpha_prod = alphas_cumprod[timesteps]
    alpha_prod_prev = np.where(
        prev_timesteps >= 0,
        alphas_cumprod[np.clip(prev_timesteps, 0, None)],
        final_alpha_cumprod,
    )
    beta_prod = 1.0 - alpha_prod
    beta_prod_prev = 1.0 - alpha_prod_prev
    variance = (beta_prod_prev / beta_prod) * (1.0 - alpha_prod / alpha_prod_prev)
    sigma = np.sqrt(1.0 / alpha_prod - 1.0)

    return DiffusionSchedule(
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=dtype),
        final_alpha_cumprod=jnp.asarray(final_alpha_cumprod, dtype=dtype),
        timesteps=jnp.asarray(timesteps, dtype=jnp.int32),
        step_alpha_prod=jnp.asarray(alpha_prod, dtype=dtype),
        step_alpha_prod_prev=jnp.asarray(alpha_prod_prev, dtype=dtype),
        step_variance=jnp.asarray(variance, dtype=dtype),
        step_sigma=jnp.asarray(sigma, dtype=dtype),
        num_train_timesteps=config.num_train_timesteps,
        num_inference_steps=num_inference_steps,
        prediction_type=config.prediction_type,
    )


# ---------------------------------------------------------------------------
# Core per-step math. All functions take the step *position* k (0 = largest
# timestep) so that lax.scan loops never search for timesteps.
# ---------------------------------------------------------------------------


def pred_original_sample(sched: DiffusionSchedule, k, x, model_output):
    """Predicted x0 from a model output at step position k.

    epsilon:      x0 = (x - sqrt(1-abar) eps) / sqrt(abar)
    v_prediction: x0 = sqrt(abar) x - sqrt(1-abar) v
    (reference: models.py:88-93, 129-134)
    """
    a = sched.step_alpha_prod[k]
    if sched.prediction_type == "epsilon":
        return (x - jnp.sqrt(1.0 - a) * model_output) / jnp.sqrt(a)
    elif sched.prediction_type == "v_prediction":
        return jnp.sqrt(a) * x - jnp.sqrt(1.0 - a) * model_output
    raise ValueError(sched.prediction_type)


def pred_epsilon(sched: DiffusionSchedule, k, x, model_output):
    """Noise direction used for the "direction pointing to x_t" term.

    epsilon:      eps = model_output
    v_prediction: eps = sqrt(abar) v + sqrt(1-abar) x
    (reference: models.py:102-105, 142-145)
    """
    a = sched.step_alpha_prod[k]
    if sched.prediction_type == "epsilon":
        return model_output
    elif sched.prediction_type == "v_prediction":
        return jnp.sqrt(a) * model_output + jnp.sqrt(1.0 - a) * x
    raise ValueError(sched.prediction_type)


def get_variance(sched: DiffusionSchedule, k):
    """DDIM posterior variance at step position k (reference: models.py:539-545)."""
    return sched.step_variance[k]


def get_sigma(sched: DiffusionSchedule, k):
    """sqrt(1/alpha_bar[t_k] - 1) (reference: models.py:25-27)."""
    return sched.step_sigma[k]


def add_noise(sched: DiffusionSchedule, x0, noise, t):
    """q(x_t | x_0) sample at *train* timestep t (diffusers add_noise)."""
    a = sched.alphas_cumprod[t]
    return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise


def sample_xts_from_x0(
    sched: DiffusionSchedule, x0: jnp.ndarray, rng: jax.Array
) -> jnp.ndarray:
    """Sample the full trajectory {x_t ~ q(x_t|x_0)} *independently* per t.

    This is the edit-friendly-inversion trick (reference: models.py:67-83):
    each x_t is a fresh q(x_t|x_0) sample, NOT a correlated diffusion path.

    Returns xts of shape (S+1, *x0.shape) with xts[0] = x0 and
    xts[S - k] the sample at timesteps[k]  (so xts[S] is the noisiest).
    All S samples are drawn in one batched op — no Python loop.
    """
    S = sched.num_inference_steps
    noise = jax.random.normal(rng, (S,) + x0.shape, dtype=x0.dtype)
    a = sched.step_alpha_prod  # (S,) aligned with timesteps (descending t)
    # xts index: idx = S - k  for timesteps[k]  ->  flip so idx 1..S maps k S-1..0
    expand = (S,) + (1,) * x0.ndim
    scaled = jnp.sqrt(a).reshape(expand) * x0[None] + jnp.sqrt(1.0 - a).reshape(
        expand
    ) * noise
    # scaled[k] is the sample at timesteps[k]; xts[S-k] = scaled[k]
    xts = jnp.concatenate([x0[None], jnp.flip(scaled, axis=0)], axis=0)
    return xts


def get_zs_from_xts(
    sched: DiffusionSchedule,
    k,
    xt: jnp.ndarray,
    xtm1: jnp.ndarray,
    model_output: jnp.ndarray,
    eta: float = 1.0,
    numerical_fix: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Recover the per-step noise map z_t that maps x_t -> x_{t-1}.

    The inversion core (reference: models.py:85-117): compute the DDIM mean
    mu_t(x_t) and solve  x_{t-1} = mu_t + eta*sqrt(var)*z  for z. With
    ``numerical_fix`` the returned x_{t-1} is re-projected to exactly
    mu_t + eta*sqrt(var)*z, stopping error accumulation.

    Returns (z, xtm1_fixed).
    """
    a_prev = sched.step_alpha_prod_prev[k]
    variance = sched.step_variance[k]

    x0_pred = pred_original_sample(sched, k, xt, model_output)
    eps = pred_epsilon(sched, k, xt, model_output)

    pred_sample_direction = jnp.sqrt(1.0 - a_prev - eta * variance) * eps
    mu_xt = jnp.sqrt(a_prev) * x0_pred + pred_sample_direction

    std = eta * jnp.sqrt(variance)
    z = (xtm1 - mu_xt) / std
    if numerical_fix:
        xtm1 = mu_xt + std * z
    return z, xtm1


def reverse_step_with_custom_noise(
    sched: DiffusionSchedule,
    k,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    variance_noise: Optional[jnp.ndarray] = None,
    eta: float = 0.0,
) -> jnp.ndarray:
    """One DDIM reverse step x_t -> x_{t-1} with externally supplied noise.

    (reference: models.py:119-158; formula (12) of arXiv:2010.02502 with the
    eta*variance generalisation used by the paper.)
    """
    a_prev = sched.step_alpha_prod_prev[k]
    variance = sched.step_variance[k]

    x0_pred = pred_original_sample(sched, k, sample, model_output)
    eps = pred_epsilon(sched, k, sample, model_output)

    pred_sample_direction = jnp.sqrt(1.0 - a_prev - eta * variance) * eps
    prev_sample = jnp.sqrt(a_prev) * x0_pred + pred_sample_direction
    if variance_noise is not None:
        prev_sample = prev_sample + eta * jnp.sqrt(variance) * variance_noise
    return prev_sample


def ddim_step(
    sched: DiffusionSchedule,
    k,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    eta: float = 0.0,
    variance_noise: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """diffusers DDIMScheduler.step equivalent; returns (prev_sample, x0_pred).

    Used by forward_directional / SDEdit (reference: pc_drift.py:89-93).
    Matches reverse_step_with_custom_noise with std_dev_t**2 = eta^2 * var,
    which is diffusers' exact formula (std_dev_t = eta*sqrt(var)).
    """
    a_prev = sched.step_alpha_prod_prev[k]
    variance = sched.step_variance[k]
    std_dev_t = eta * jnp.sqrt(variance)

    x0_pred = pred_original_sample(sched, k, sample, model_output)
    eps = pred_epsilon(sched, k, sample, model_output)

    pred_sample_direction = jnp.sqrt(1.0 - a_prev - std_dev_t ** 2) * eps
    prev_sample = jnp.sqrt(a_prev) * x0_pred + pred_sample_direction
    if variance_noise is not None:
        prev_sample = prev_sample + std_dev_t * variance_noise
    return prev_sample, x0_pred


def ddim_next_step(
    sched: DiffusionSchedule, k, model_output: jnp.ndarray, sample: jnp.ndarray
) -> jnp.ndarray:
    """Deterministic DDIM *inversion* step x_t -> x_{t+ratio} at position k.

    k indexes `timesteps` (descending); this maps the sample at
    timesteps[k] - ratio up to timesteps[k]  (reference: ddim_inversion.py:10-20,
    where `next_timestep = timestep` and `timestep = timestep - ratio`).
    Only valid for epsilon-prediction (the reference baseline likewise assumes it).
    """
    # step_alpha_prod_prev already falls back to final_alpha_cumprod for
    # negative prev timesteps (make_schedule)
    a_t = sched.step_alpha_prod_prev[k]
    a_next = sched.step_alpha_prod[k]
    x0_pred = (sample - jnp.sqrt(1.0 - a_t) * model_output) / jnp.sqrt(a_t)
    next_sample_direction = jnp.sqrt(1.0 - a_next) * model_output
    return jnp.sqrt(a_next) * x0_pred + next_sample_direction
