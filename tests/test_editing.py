"""Editing-algorithm tests with analytic fake denoisers.

The exact-inversion property (forward then reverse with the same prompts
reconstructs x0) is the correctness core of the whole system — the
reference checks it only by commented-out prints
(inversion_utils.py:127,305); here it is a hard assertion.
"""

import numpy as np
import jax
import jax.numpy as jnp

from audioeditingcode_tpu.schedulers import DDIMConfig, make_schedule
from audioeditingcode_tpu.editing.invert import (
    inversion_forward_process,
    inversion_reverse_process,
    make_cfg_denoiser,
)
from audioeditingcode_tpu.editing.ddim import ddim_inversion_loop, ddim_generation_loop
from audioeditingcode_tpu.editing.cfg import build_cfg_tensors
from audioeditingcode_tpu.editing.pc_drift import (
    PCStreamChoice,
    apply_drift,
    forward_directional,
    get_eigenvectors,
)
from audioeditingcode_tpu.editing.sdedit import sdedit_loop

CFG = DDIMConfig(beta_start=0.0015, beta_end=0.0195)
SHAPE = (1, 4, 8, 16)


def linear_denoiser(scale=0.1):
    def denoise(x, k):
        return scale * x

    return denoise


def linear_eps_pair(scale=0.1):
    def pair(x_u, x_c, k):
        eps_u = scale * x_u
        eps_c = scale * x_c if x_c is not None else None
        return eps_u, eps_c

    return pair


def test_inversion_roundtrip_reconstructs_x0():
    sched = make_schedule(CFG, 50)
    x0 = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
    denoise = linear_denoiser(0.2)

    xT, zs, xts = inversion_forward_process(
        sched, denoise, x0, jax.random.PRNGKey(1), eta=1.0, numerical_fix=True,
        zero_first=False,
    )
    assert zs.shape == (50,) + SHAPE
    assert xts.shape == (51,) + SHAPE
    # the fixed trajectory start is x0 itself (numerical_fix is an exact
    # re-projection)
    np.testing.assert_allclose(np.asarray(xts[0]), np.asarray(x0), atol=1e-5)

    # full reverse with the same denoiser reconstructs x0 exactly
    out = inversion_reverse_process(sched, denoise, xts, zs, eta=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)

    # with the reference's zeroed z_0 (inversion_utils.py:133) the error is
    # confined to the final step's small variance
    _, zs0, xts0 = inversion_forward_process(
        sched, denoise, x0, jax.random.PRNGKey(1), eta=1.0, numerical_fix=True
    )
    np.testing.assert_allclose(np.asarray(zs0[0]), 0.0)
    out0 = inversion_reverse_process(sched, denoise, xts0, zs0, eta=1.0)
    assert float(jnp.abs(out0 - x0).max()) < 0.5


def test_partial_tstart_reverse():
    """Editing from tstart < S uses only the first tstart noise maps."""
    sched = make_schedule(CFG, 40)
    x0 = jax.random.normal(jax.random.PRNGKey(2), SHAPE)
    denoise = linear_denoiser(0.1)
    _, zs, xts = inversion_forward_process(
        sched, denoise, x0, jax.random.PRNGKey(3), zero_first=False
    )
    tstart = 25
    out = inversion_reverse_process(sched, denoise, xts, zs[:tstart], eta=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xts[0]), atol=1e-4)


def test_multiprompt_cfg_and_mask_fix_shapes():
    sched = make_schedule(CFG, 20)
    x0 = jax.random.normal(jax.random.PRNGKey(4), SHAPE)
    prompts = ["a", "b"]
    cfg_t, masks = build_cfg_tensors(SHAPE, prompts, [3.0, 5.0])
    assert cfg_t.shape == (2,) + SHAPE[1:]
    assert masks.shape == (2,) + SHAPE[1:]
    # masks are a smoothed partition of unity along the time axis
    np.testing.assert_allclose(np.asarray(masks.sum(axis=0)), 1.0, atol=1e-4)

    pair = linear_eps_pair(0.1)

    def pair2(x_u, x_c, k):
        eps_u, _ = pair(x_u, None, k)
        eps_c = 0.1 * jnp.concatenate([x_c, x_c * 0.5], axis=0)  # 2 prompts
        return eps_u, eps_c

    denoise = make_cfg_denoiser(pair2, cfg_t)
    _, zs, xts = inversion_forward_process(sched, denoise, x0, jax.random.PRNGKey(5))
    tstart = jnp.array([20, 15])
    out = inversion_reverse_process(
        sched, denoise, xts, zs[:20], eta=1.0, tstart=tstart, fix_alpha=0.1, masks=masks
    )
    assert out.shape == SHAPE


def test_ddim_roundtrip_constant_field():
    """With an x-independent denoiser the DDIM baseline inverts exactly."""
    sched = make_schedule(CFG, 30)
    w0 = jax.random.normal(jax.random.PRNGKey(6), SHAPE)
    c = jax.random.normal(jax.random.PRNGKey(7), SHAPE) * 0.3

    def denoise(x, k):
        return c

    xT = ddim_inversion_loop(sched, denoise, w0, skip=0)
    back = ddim_generation_loop(sched, denoise, xT, skip=0)
    np.testing.assert_allclose(np.asarray(back), np.asarray(w0), atol=1e-3)


def test_sdedit_runs():
    sched = make_schedule(CFG, 20)
    w0 = jax.random.normal(jax.random.PRNGKey(8), SHAPE)
    out = sdedit_loop(
        sched, linear_eps_pair(0.1), w0, jax.random.PRNGKey(9), skip=10, cfg_tar=3.0
    )
    assert out.shape == SHAPE
    assert np.isfinite(np.asarray(out)).all()


def _linear_operator_eps_pair(E):
    """eps(x) = E @ flatten(x): makes the x0hat map linear for PC tests."""

    def pair(x_u, x_c, k):
        def apply(x):
            flat = x.reshape(x.shape[0], -1)
            return (flat @ E.T).reshape(x.shape)

        return apply(x_u), (apply(x_c) if x_c is not None else None)

    return pair


def test_power_iteration_finds_top_eigenvector():
    sched = make_schedule(CFG, 20)
    dim = 16
    shape = (1, 1, 4, 4)
    rng = np.random.default_rng(0)
    A = rng.standard_normal((dim, dim)).astype(np.float32)
    E = (A + A.T) / 8.0  # symmetric
    k = jnp.asarray(5)

    a = float(sched.step_alpha_prod[5])
    # x0hat(x) = (x - sqrt(1-a) E x)/sqrt(a) = M x
    M = (np.eye(dim) - np.sqrt(1 - a) * E) / np.sqrt(a)

    eps_pair = _linear_operator_eps_pair(jnp.asarray(E))
    xt = jax.random.normal(jax.random.PRNGKey(1), shape)
    latents = jnp.zeros(shape)
    mask = jnp.ones(shape)
    _, x0_pred = forward_directional(
        sched, eps_pair, xt, k, latents, cfg_tar=1.0, eta=1.0
    )

    res = get_eigenvectors(
        sched, eps_pair, xt, latents, mask, k, x0_pred,
        jax.random.PRNGKey(2), const=1e-3, cfg_tar=1.0, iters=60, n_ev=1,
    )
    v = np.asarray(res.eigvecs).reshape(-1)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4

    evals, evecs = np.linalg.eigh(M @ M.T)
    top = evecs[:, -1]
    assert abs(np.dot(v, top)) > 0.99
    # convergence diagnostics recorded
    assert res.in_corrs.shape == (59, 1)
    assert float(np.abs(res.in_corrs[-1][0])) > 0.999


def test_power_iteration_multi_ev_orthonormal():
    sched = make_schedule(CFG, 20)
    shape = (2, 1, 4, 4)
    rng = np.random.default_rng(3)
    A = rng.standard_normal((16, 16)).astype(np.float32)
    E = (A + A.T) / 8.0
    eps_pair = _linear_operator_eps_pair(jnp.asarray(E))
    xt = jnp.broadcast_to(jax.random.normal(jax.random.PRNGKey(4), (1, 1, 4, 4)), shape)
    latents = jnp.zeros(shape)
    mask = jnp.ones((1, 1, 4, 4))
    k = jnp.asarray(7)
    _, x0_pred = forward_directional(sched, eps_pair, xt, k, latents, 1.0)
    res = get_eigenvectors(
        sched, eps_pair, xt, latents, mask, k, x0_pred,
        jax.random.PRNGKey(5), const=1e-3, cfg_tar=1.0, iters=60, n_ev=2,
    )
    V = np.asarray(res.eigvecs).reshape(2, -1)
    gram = V @ V.T
    np.testing.assert_allclose(gram, np.eye(2), atol=1e-3)
    assert res.eigvals[0] >= res.eigvals[1]
    assert res.interm_eigvecs.shape[0] == len(res.snapshot_iters)


def test_apply_drift_zero_amount_is_identity():
    sched = make_schedule(CFG, 20)
    shape = (1, 1, 4, 4)
    xt_m1 = jax.random.normal(jax.random.PRNGKey(10), shape)
    x0_pred = jax.random.normal(jax.random.PRNGKey(11), shape)
    eig = jax.random.normal(jax.random.PRNGKey(12), shape)
    latent = jax.random.normal(jax.random.PRNGKey(13), shape)
    out = apply_drift(
        sched, jnp.asarray(4), xt_m1, x0_pred, eig, jnp.array([2.0]), latent,
        eta=1.0, amount=0.0,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(xt_m1), atol=1e-5)


def test_apply_drift_moves_along_pc():
    sched = make_schedule(CFG, 20)
    shape = (1, 1, 4, 4)
    xt_m1 = jax.random.normal(jax.random.PRNGKey(14), shape)
    x0_pred = jax.random.normal(jax.random.PRNGKey(15), shape)
    eig = jnp.ones(shape) / 4.0  # unit norm
    latent = jnp.zeros(shape)
    out = apply_drift(
        sched, jnp.asarray(4), xt_m1, x0_pred, eig, jnp.array([4.0]), latent,
        eta=1.0, amount=1.0, use_shifted_x0_for_noisepred=False,
    )
    k = 4
    a_prev = float(sched.step_alpha_prod_prev[k])
    delta = np.asarray(out - xt_m1)
    expected = np.sqrt(a_prev) * 2.0 * np.asarray(eig)  # sqrt(eigval)=2
    np.testing.assert_allclose(delta, expected, atol=1e-5)


def test_cfg_zero_empty_single_prompt():
    """zero_empty_prompts holds in the single-prompt branch too: an empty
    source prompt yields a zero CFG tensor (reference single-empty-prompt
    == uncond-only, inversion_utils.py:24,47-48)."""
    import numpy as np

    shape = (1, 4, 16, 32)
    cfg, masks = build_cfg_tensors(shape, [""], [3.0], zero_empty_prompts=True)
    assert float(np.abs(np.asarray(cfg)).max()) == 0.0
    cfg2, _ = build_cfg_tensors(shape, ["a drum"], [3.0], zero_empty_prompts=True)
    assert float(np.asarray(cfg2).max()) == 3.0
    cfg3, _ = build_cfg_tensors(shape, [""], [3.0])  # flag off: unchanged
    assert float(np.asarray(cfg3).max()) == 3.0
