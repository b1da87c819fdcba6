"""Scheduler numerics vs an independent numpy mirror of diffusers semantics.

The reference has no tests (SURVEY.md §4); these property tests pin the math
of code/models.py:25-158 (sample_xts_from_x0 / get_zs_from_xts /
reverse_step_with_custom_noise) against closed-form DDIM identities.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audioeditingcode_tpu.schedulers import (
    DDIMConfig,
    make_schedule,
    make_betas,
    sample_xts_from_x0,
    get_zs_from_xts,
    reverse_step_with_custom_noise,
    ddim_step,
    ddim_next_step,
)


def numpy_reference_schedule(cfg: DDIMConfig, steps: int):
    """Independent mirror of diffusers DDIMScheduler bookkeeping."""
    if cfg.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5, cfg.num_train_timesteps) ** 2
        )
    else:
        betas = np.linspace(cfg.beta_start, cfg.beta_end, cfg.num_train_timesteps)
    abar = np.cumprod(1 - betas)
    final = 1.0 if cfg.set_alpha_to_one else abar[0]
    ratio = cfg.num_train_timesteps // steps
    ts = (np.arange(steps) * ratio).round()[::-1].astype(int) + cfg.steps_offset
    return betas, abar, final, ts, ratio


AUDIOLDM = DDIMConfig(
    num_train_timesteps=1000, beta_start=0.0015, beta_end=0.0195,
    beta_schedule="scaled_linear", prediction_type="epsilon",
    set_alpha_to_one=False, steps_offset=1,
)
TANGO_V = DDIMConfig(
    num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
    beta_schedule="scaled_linear", prediction_type="v_prediction",
    set_alpha_to_one=False, steps_offset=1,
)


@pytest.mark.parametrize("cfg,steps", [(AUDIOLDM, 200), (AUDIOLDM, 100), (TANGO_V, 200), (AUDIOLDM, 50)])
def test_schedule_matches_numpy_mirror(cfg, steps):
    sched = make_schedule(cfg, steps)
    betas, abar, final, ts, ratio = numpy_reference_schedule(cfg, steps)

    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), abar, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(sched.timesteps), ts)
    assert sched.step_ratio == ratio

    a = abar[ts]
    prev = ts - ratio
    a_prev = np.where(prev >= 0, abar[np.clip(prev, 0, None)], final)
    np.testing.assert_allclose(np.asarray(sched.step_alpha_prod), a, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.step_alpha_prod_prev), a_prev, rtol=1e-6)

    var = ((1 - a_prev) / (1 - a)) * (1 - a / a_prev)
    np.testing.assert_allclose(np.asarray(sched.step_variance), var, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sched.step_sigma), np.sqrt(1 / a - 1), rtol=1e-5
    )


def test_beta_schedules_all_build():
    for sch in ["linear", "scaled_linear", "squaredcos_cap_v2"]:
        betas = make_betas(DDIMConfig(beta_schedule=sch))
        assert betas.shape == (1000,)
        assert (betas > 0).all() and (betas < 1).all()


def test_sample_xts_layout_and_marginals():
    """xts[0]=x0; xts[S-k] ~ q(x_{t_k} | x0) with the right mean/std."""
    sched = make_schedule(AUDIOLDM, 50)
    x0 = jnp.ones((1, 4, 8, 16)) * 2.0
    xts = sample_xts_from_x0(sched, x0, jax.random.PRNGKey(0))
    assert xts.shape == (51, 1, 4, 8, 16)
    np.testing.assert_allclose(np.asarray(xts[0]), np.asarray(x0))

    # statistical check at the noisiest step (k=0 -> idx=S)
    a = float(sched.step_alpha_prod[0])
    samp = np.asarray(xts[50])
    assert abs(samp.mean() - 2.0 * a ** 0.5) < 4 * np.sqrt(1 - a) / np.sqrt(samp.size)


def test_zs_roundtrip_identity():
    """z recovered by get_zs_from_xts must exactly regenerate x_{t-1} through
    reverse_step_with_custom_noise (the exact-inversion property the whole
    editing method rests on)."""
    sched = make_schedule(AUDIOLDM, 50)
    rng = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(rng, 3)
    xt = jax.random.normal(k1, (1, 4, 8, 16))
    xtm1 = jax.random.normal(k2, (1, 4, 8, 16))
    eps = jax.random.normal(k3, (1, 4, 8, 16))

    for k in [0, 10, 25, 48]:
        z, xtm1_fix = get_zs_from_xts(sched, k, xt, xtm1, eps, eta=1.0, numerical_fix=True)
        recon = reverse_step_with_custom_noise(sched, k, eps, xt, variance_noise=z, eta=1.0)
        np.testing.assert_allclose(np.asarray(recon), np.asarray(xtm1_fix), atol=1e-5)
        # with numerical_fix, the fixed xtm1 equals the raw target up to float error
        np.testing.assert_allclose(np.asarray(xtm1_fix), np.asarray(xtm1), atol=1e-4)


def test_zs_roundtrip_identity_vpred():
    sched = make_schedule(TANGO_V, 50)
    rng = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(rng, 3)
    xt = jax.random.normal(k1, (1, 4, 8, 16))
    xtm1 = jax.random.normal(k2, (1, 4, 8, 16))
    v = jax.random.normal(k3, (1, 4, 8, 16))
    for k in [0, 25, 48]:
        z, xtm1_fix = get_zs_from_xts(sched, k, xt, xtm1, v, eta=1.0, numerical_fix=True)
        recon = reverse_step_with_custom_noise(sched, k, v, xt, variance_noise=z, eta=1.0)
        np.testing.assert_allclose(np.asarray(recon), np.asarray(xtm1_fix), atol=1e-5)


def test_ddim_step_eta0_deterministic_roundtrip():
    """eta=0 DDIM step inverts ddim_next_step when eps is consistent."""
    sched = make_schedule(AUDIOLDM, 50)
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (1, 4, 8, 16))
    eps = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 8, 16))
    for k in [5, 20, 40]:
        up = ddim_next_step(sched, k, eps, x)  # x at t_k - ratio -> t_k
        down, _ = ddim_step(sched, k, eps, up, eta=0.0)  # back down
        np.testing.assert_allclose(np.asarray(down), np.asarray(x), atol=1e-4)


def test_ddim_step_matches_reverse_step_at_eta1():
    """At eta=1 diffusers' step (std^2=eta^2 var) equals the reference's
    reverse_step (eta*var) — both used interchangeably in the reference."""
    sched = make_schedule(AUDIOLDM, 50)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 8, 16))
    eps = jax.random.normal(jax.random.PRNGKey(6), (1, 4, 8, 16))
    z = jax.random.normal(jax.random.PRNGKey(7), (1, 4, 8, 16))
    for k in [3, 30]:
        a, _ = ddim_step(sched, k, eps, x, eta=1.0, variance_noise=z)
        b = reverse_step_with_custom_noise(sched, k, eps, x, variance_noise=z, eta=1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
