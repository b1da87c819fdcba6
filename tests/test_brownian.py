"""Brownian-tree noise sampler (schedulers/brownian.py).

Rebuilds the contract of the reference's BrownianTreeNoiseSampler
(reference code/models.py:1305-1312, torchsde-backed): per-step variance
noise = normalized increments of ONE seeded Brownian path, so runs with
different step counts share the path. The tests pin the three properties
that make it a Brownian tree rather than i.i.d. noise: determinism,
refinement consistency, and the N(0, |dt|) increment law.
"""

import numpy as np
import pytest

from audioeditingcode_tpu.schedulers.brownian import (
    BrownianPath,
    brownian_noise_for_sigmas,
)

SHAPE = (2, 3, 64)


def test_deterministic_and_seed_sensitive():
    sig = np.linspace(10.0, 0.0, 9)
    a = brownian_noise_for_sigmas(7, sig, SHAPE)
    b = brownian_noise_for_sigmas(7, sig, SHAPE)
    c = brownian_noise_for_sigmas(8, sig, SHAPE)
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)
    assert a.shape == (8,) + SHAPE and a.dtype == np.float32


def test_query_set_independence():
    """W(t) depends only on (seed, t): evaluating through different query
    sets returns identical values (torchsde's cross-run consistency)."""
    p = BrownianPath(3, SHAPE, t0=0.0, t1=16.0)
    w_alone = p(5.3)
    _ = [p(t) for t in (15.0, 1.0, 9.9)]  # unrelated queries
    np.testing.assert_array_equal(w_alone, p(5.3))


def test_refinement_consistency_across_step_counts():
    """A coarse run's unnormalized increments equal the sum of the fine
    run's increments over the same interval — both runs ride one path.
    (This is exactly what i.i.d. per-step noise does NOT satisfy.)"""
    sig_fine = np.linspace(8.0, 0.0, 17)  # 16 steps
    sig_coarse = sig_fine[::2]  # 8 steps, same endpoints
    fine = brownian_noise_for_sigmas(11, sig_fine, SHAPE)
    coarse = brownian_noise_for_sigmas(11, sig_coarse, SHAPE)
    dt_f = np.abs(np.diff(sig_fine)).astype(np.float32)
    dt_c = np.abs(np.diff(sig_coarse)).astype(np.float32)
    # un-normalize, pair-sum the fine increments, re-normalize as coarse
    w_fine = fine * np.sqrt(dt_f)[:, None, None, None]
    paired = w_fine[0::2] + w_fine[1::2]
    np.testing.assert_allclose(
        paired, coarse * np.sqrt(dt_c)[:, None, None, None],
        rtol=1e-4, atol=1e-5)


def test_increment_marginals_are_standard_normal():
    """Normalized increments ~ N(0, 1) marginally (k-diffusion's
    normalization, models.py:1310-1312): check moments over a large
    shape x many steps."""
    sig = np.linspace(50.0, 0.0, 33)
    out = brownian_noise_for_sigmas(0, sig, (4096,))
    flat = out.ravel()
    assert abs(flat.mean()) < 0.02
    assert abs(flat.std() - 1.0) < 0.02
    # increments over DISJOINT intervals are independent: correlation ~ 0
    r = np.corrcoef(out[5], out[20])[0, 1]
    assert abs(r) < 0.05


def test_zero_width_interval_gives_zero_noise():
    sig = np.array([4.0, 2.0, 2.0, 0.0])
    out = brownian_noise_for_sigmas(1, sig, (8,))
    assert np.all(out[1] == 0)
    assert not np.allclose(out[0], 0) and not np.allclose(out[2], 0)


def test_rejects_bad_schedules():
    with pytest.raises(ValueError):
        brownian_noise_for_sigmas(0, np.array([1.0]), (4,))
    with pytest.raises(ValueError):
        brownian_noise_for_sigmas(0, np.zeros(4), (4,))


def test_sdedit_cosine_consumes_brownian_noise():
    """End-to-end: the Stable Audio SDEdit loop accepts the pre-sampled
    Brownian rows and produces the same output as the equivalent i.i.d.
    array passed through the same seam (the loop is noise-source
    agnostic; selection happens in the CLI)."""
    import jax
    import jax.numpy as jnp

    from audioeditingcode_tpu.editing.sdedit import sdedit_loop_cosine
    from audioeditingcode_tpu.editing.solvers import as_solver
    from audioeditingcode_tpu.models.registry import load_model

    pipe = load_model("test/tiny-stable-audio", num_diffusion_steps=4)
    solver = as_solver(pipe.sched)
    pair = pipe.make_eps_pair(
        pipe.encode_text([""], negative=True), pipe.encode_text(["x"]))
    w0 = jax.random.normal(jax.random.PRNGKey(0),
                           (1, 4, pipe.sample_size))
    sigmas = np.asarray(solver.sched.sigmas)
    zs = brownian_noise_for_sigmas(5, sigmas, w0.shape)
    out = sdedit_loop_cosine(solver, pair, w0, jax.random.PRNGKey(1), 0,
                             3.0, noises=jnp.asarray(zs))
    assert out.shape == w0.shape
    assert np.isfinite(np.asarray(out)).all()
    # a different Brownian seed changes the trajectory
    zs2 = brownian_noise_for_sigmas(6, sigmas, w0.shape)
    out2 = sdedit_loop_cosine(solver, pair, w0, jax.random.PRNGKey(1), 0,
                              3.0, noises=jnp.asarray(zs2))
    assert not np.allclose(np.asarray(out), np.asarray(out2))
