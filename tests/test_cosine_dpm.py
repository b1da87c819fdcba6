"""Cosine DPM-Solver++ (Stable Audio) numerics tests.

Covers the hardest math in the rebuild (SURVEY.md §7 hard-parts #1): the
2nd-order SDE-DPM-Solver++ inversion with multistep history under lax.scan
(reference behaviour: code/models.py:1190-1329).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audioeditingcode_tpu.schedulers.cosine_dpm import (
    CosineDPMConfig,
    convert_model_output,
    init_solver_state,
    make_cosine_dpm_schedule,
    recover_noise,
    sample_xts_from_x0_sigma,
    scale_model_input,
    solver_step,
)
from audioeditingcode_tpu.editing.solvers import CosineDPMSolver
from audioeditingcode_tpu.editing.invert import (
    inversion_forward_process,
    inversion_reverse_process,
)

CFG = CosineDPMConfig()


def _denoiser(sched):
    """Deterministic fake DiT: v-pred as a fixed function of (scaled input, t)."""

    def fn(xt, k):
        x_in = scale_model_input(sched, k, xt)
        t = sched.timesteps[k]
        return 0.3 * x_in + 0.1 * jnp.sin(7.0 * t) - 0.05 * x_in ** 2

    return fn


class TestSchedule:
    def test_exponential_sigma_grid(self):
        sched = make_cosine_dpm_schedule(CFG, 10)
        s = np.asarray(sched.sigmas)
        assert s.shape == (11,)
        assert np.isclose(s[0], 500.0)
        assert np.isclose(s[9], 0.3)
        assert s[10] == 0.0
        assert (np.diff(s) < 0).all()
        # log-spacing
        assert np.allclose(np.diff(np.log(s[:10])), np.log(0.3 / 500.0) / 9)

    def test_timesteps_are_atan_sigma(self):
        sched = make_cosine_dpm_schedule(CFG, 25)
        np.testing.assert_allclose(
            np.asarray(sched.timesteps),
            np.arctan(np.asarray(sched.sigmas[:25])) / np.pi * 2,
            rtol=1e-6,
        )

    def test_final_step_flags(self):
        sched = make_cosine_dpm_schedule(CFG, 30)
        flags = np.asarray(sched.step_first_order)
        assert flags[-1]  # final_sigmas_type=zero forces first order
        assert not flags[:-1].any()
        assert np.asarray(sched.step_zero_noise)[-1]

    def test_small_s_lower_order(self):
        sched = make_cosine_dpm_schedule(CFG, 8)
        assert np.asarray(sched.step_first_order)[-1]

    def test_karras_schedule(self):
        sched = make_cosine_dpm_schedule(
            CosineDPMConfig(sigma_schedule="karras"), 10
        )
        s = np.asarray(sched.sigmas)
        assert np.isclose(s[0], 500.0) and np.isclose(s[9], 0.3)


class TestPreconditioning:
    def test_scale_model_input(self):
        sched = make_cosine_dpm_schedule(CFG, 5)
        x = jnp.ones((1, 4, 8))
        got = scale_model_input(sched, 0, x)
        sig = float(sched.sigmas[0])
        np.testing.assert_allclose(
            np.asarray(got), 1.0 / np.sqrt(sig ** 2 + 1.0), rtol=1e-6
        )

    def test_convert_v_prediction(self):
        sched = make_cosine_dpm_schedule(CFG, 5)
        x = jnp.full((2, 3), 2.0)
        v = jnp.full((2, 3), 0.5)
        sig = float(sched.sigmas[2])
        want = (1.0 / (sig ** 2 + 1)) * 2.0 - (sig / np.sqrt(sig ** 2 + 1)) * 0.5
        np.testing.assert_allclose(
            np.asarray(convert_model_output(sched, 2, x, v)), want, rtol=1e-5
        )


def _sequential_reference(sched, denoise, xts):
    """Stateful loop mirroring the diffusers/HF scheduler semantics: explicit
    step_index, model_outputs deque, lower_order_nums. Independent check of
    the scan implementation's index bookkeeping."""
    S = sched.num_inference_steps
    sig = np.asarray(sched.sigmas, dtype=np.float64)
    model_outputs = [None, None]
    lower_order_nums = 0
    zs = np.zeros((S,) + xts.shape[1:])
    new_xts = np.array(xts, dtype=np.float64)
    extras = [None] * S

    for k in range(S):
        idx = S - k - 1
        xt = new_xts[idx + 1]
        out = np.asarray(denoise(jnp.asarray(xt, dtype=jnp.float32), k), np.float64)
        xtm1 = new_xts[idx]

        sigma = sig[k]
        c_skip = 1.0 / (sigma ** 2 + 1.0)
        c_out = -sigma / np.sqrt(sigma ** 2 + 1.0)
        data_pred = c_skip * xt + c_out * out

        model_outputs[0] = model_outputs[1]
        model_outputs[1] = data_pred
        extras[idx] = model_outputs[0]

        sigma_t, sigma_s = sig[k + 1], sig[k]
        last = k == S - 1
        first = lower_order_nums < 1 or last
        if last:
            z = np.zeros_like(xt)
            xtm1_fix = data_pred
        else:
            h = np.log(sigma_s) - np.log(sigma_t)
            ratio = sigma_t / sigma_s * np.exp(-h)
            one_m = 1.0 - np.exp(-2.0 * h)
            denom = sigma_t * np.sqrt(one_m)
            if first:
                z = (xtm1 - ratio * xt - one_m * data_pred) / denom
                xtm1_fix = ratio * xt + one_m * data_pred + denom * z
            else:
                sigma_s1 = sig[k - 1]
                h0 = np.log(sigma_s1) - np.log(sigma_s)
                r0 = h0 / h
                d1 = (model_outputs[1] - model_outputs[0]) / r0
                z = (xtm1 - ratio * xt - one_m * data_pred - 0.5 * one_m * d1) / denom
                xtm1_fix = (
                    ratio * xt + one_m * data_pred + 0.5 * one_m * d1 + denom * z
                )
        zs[idx] = z
        new_xts[idx] = xtm1_fix
        if lower_order_nums < 2:
            lower_order_nums += 1
    return zs, new_xts, extras


class TestInversion:
    @pytest.fixture()
    def setup(self):
        S = 12
        sched = make_cosine_dpm_schedule(CFG, S)
        solver = CosineDPMSolver(sched)
        x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16))
        return S, sched, solver, x0

    def test_scan_matches_sequential_reference(self, setup):
        S, sched, solver, x0 = setup
        denoise = _denoiser(sched)
        xts0 = sample_xts_from_x0_sigma(sched, x0, jax.random.PRNGKey(1))

        xT, zs, xts, extras = inversion_forward_process(
            solver, denoise, x0, jax.random.PRNGKey(1),
            zero_first=False, return_extras=True,
        )
        ref_zs, ref_xts, ref_extras = _sequential_reference(
            sched, denoise, np.asarray(xts0)
        )
        np.testing.assert_allclose(np.asarray(zs), ref_zs, rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(xts), ref_xts, rtol=2e-3, atol=2e-4)
        # extras[S-1] (the first processed step, k=0) has no predecessor:
        # the reference holds None there, the scan a zeros placeholder.
        for idx in range(S - 1):
            np.testing.assert_allclose(
                np.asarray(extras[idx]), ref_extras[idx], rtol=2e-3, atol=2e-4
            )

    def test_full_roundtrip_reconstructs_x0(self, setup):
        S, sched, solver, x0 = setup
        denoise = _denoiser(sched)
        xT, zs, xts, extras = inversion_forward_process(
            solver, denoise, x0, jax.random.PRNGKey(2), return_extras=True
        )
        # full reverse (T = S) with the recovered noise maps must reproduce
        # the numerically-fixed trajectory end xts[0] exactly. (Not x0: the
        # final step under final_sigmas_type='zero' ignores z and returns the
        # denoised prediction — the same reason the reference zeroes zs[0].)
        rec = inversion_reverse_process(solver, denoise, xts, zs)
        np.testing.assert_allclose(
            np.asarray(rec[0]), np.asarray(xts[0, 0]), atol=1e-4
        )

    def test_warm_start_reverse_reproduces_trajectory(self, setup):
        S, sched, solver, x0 = setup
        denoise = _denoiser(sched)
        _, zs, xts, extras = inversion_forward_process(
            solver, denoise, x0, jax.random.PRNGKey(3), return_extras=True
        )
        T = S - 4  # start mid-trajectory: needs warm 2nd-order history
        rec = inversion_reverse_process(
            solver, denoise, xts, zs[:T], init_history=extras[T - 1]
        )
        np.testing.assert_allclose(
            np.asarray(rec[0]), np.asarray(xts[0, 0]), atol=1e-4
        )

    def test_cold_start_differs_from_warm(self, setup):
        """Without history the first reverse step is first-order — close but
        not identical (documents why extra_info threading matters)."""
        S, sched, solver, x0 = setup
        denoise = _denoiser(sched)
        _, zs, xts, extras = inversion_forward_process(
            solver, denoise, x0, jax.random.PRNGKey(4), return_extras=True
        )
        T = S - 4
        warm = inversion_reverse_process(
            solver, denoise, xts, zs[:T], init_history=extras[T - 1]
        )
        cold = inversion_reverse_process(solver, denoise, xts, zs[:T])
        assert not np.allclose(np.asarray(warm), np.asarray(cold), atol=1e-7)

    def test_bfloat16_latent_roundtrips(self, setup):
        """Regression: a bfloat16 latent (the CLI's --dtype bfloat16 Stable
        Audio path — the Oobleck vae_encode emits the params dtype) must not
        desynchronize the scan carry. The in-scan solver math promotes to
        f32 (f32 sigmas), so the history state must be created in the
        promoted dtype; before the fix lax.scan raised TypeError (carry m1
        bf16 in, f32 out)."""
        S, sched, solver, x0 = setup
        denoise = _denoiser(sched)
        x0_bf16 = x0.astype(jnp.bfloat16)
        _, zs, xts, extras = inversion_forward_process(
            solver, denoise, x0_bf16, jax.random.PRNGKey(6),
            return_extras=True,
        )
        assert xts.dtype == jnp.float32  # trajectory lives in solver space
        rec = inversion_reverse_process(solver, denoise, xts, zs)
        np.testing.assert_allclose(
            np.asarray(rec[0]), np.asarray(xts[0, 0]), atol=1e-4
        )

    def test_first_order_flag(self, setup):
        S, sched, _, x0 = setup
        solver1 = CosineDPMSolver(sched, first_order=True)
        denoise = _denoiser(sched)
        _, zs, xts = inversion_forward_process(
            solver1, denoise, x0, jax.random.PRNGKey(5)
        )
        rec = inversion_reverse_process(solver1, denoise, xts, zs)
        np.testing.assert_allclose(
            np.asarray(rec[0]), np.asarray(xts[0, 0]), atol=1e-4
        )

    def test_sample_xts_statistics(self):
        sched = make_cosine_dpm_schedule(CFG, 40)
        x0 = jnp.zeros((1, 2, 2048))
        xts = sample_xts_from_x0_sigma(sched, x0, jax.random.PRNGKey(0))
        # xts[S] drawn at sigma_max, xts[1] at sigma_min
        assert np.isclose(np.asarray(xts[40]).std(), 500.0, rtol=0.1)
        assert np.isclose(np.asarray(xts[1]).std(), 0.3, rtol=0.1)
        assert np.abs(np.asarray(xts[0])).max() == 0.0


class TestSolverStepUnit:
    def test_final_step_returns_denoised(self):
        sched = make_cosine_dpm_schedule(CFG, 6)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 4))
        v = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 4))
        state = init_solver_state(x, m1=jnp.zeros_like(x))
        k = 5
        _, prev = solver_step(sched, state, k, v, x, jnp.ones_like(x) * 9.0)
        want = convert_model_output(sched, k, x, v)
        np.testing.assert_allclose(np.asarray(prev), np.asarray(want), rtol=1e-5)

    def test_recover_noise_inverts_solver_step(self):
        sched = make_cosine_dpm_schedule(CFG, 10)
        rngs = jax.random.split(jax.random.PRNGKey(7), 4)
        x = jax.random.normal(rngs[0], (1, 3, 8))
        v = jax.random.normal(rngs[1], (1, 3, 8))
        m1 = jax.random.normal(rngs[2], (1, 3, 8))
        z_true = jax.random.normal(rngs[3], (1, 3, 8))
        for k in [1, 4, 8]:
            state = init_solver_state(x, m1=m1)
            _, xtm1 = solver_step(sched, state, k, v, x, z_true)
            state2 = init_solver_state(x, m1=m1)
            _, z, xtm1_fix, extra = recover_noise(sched, state2, k, x, xtm1, v)
            np.testing.assert_allclose(
                np.asarray(z), np.asarray(z_true), rtol=1e-3, atol=1e-4
            )
            np.testing.assert_allclose(
                np.asarray(xtm1_fix), np.asarray(xtm1), rtol=1e-4, atol=1e-5
            )
            np.testing.assert_allclose(np.asarray(extra), np.asarray(m1))
