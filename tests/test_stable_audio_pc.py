"""Unsupervised PC editing on the Stable Audio family (beyond the reference,
whose forward_directional is DDIM-bound — code/pc_drift.py:29-93): the
cosine DPM solver drives the directional/power-iteration/drift steps through
the same solver seam.
"""

import os

import numpy as np
import pytest
from scipy.io import wavfile

import jax
import jax.numpy as jnp

from audioeditingcode_tpu.editing.pc_drift import (
    apply_drift,
    forward_directional,
    get_eigenvectors,
)
from audioeditingcode_tpu.editing.solvers import as_solver
from audioeditingcode_tpu.models.registry import load_model
from audioeditingcode_tpu.schedulers.cosine_dpm import convert_model_output


@pytest.fixture(scope="module")
def sa_pipe():
    return load_model("test/tiny-stable-audio", num_diffusion_steps=4)


@pytest.fixture(scope="module")
def sa_pair(sa_pipe):
    return sa_pipe.make_eps_pair(
        sa_pipe.encode_text([""], negative=True), sa_pipe.encode_text(["abc"])
    )


def test_forward_directional_x0_pred_is_data_prediction(sa_pipe, sa_pair):
    """x0_pred must equal diffusers' precondition_outputs of the guided
    model output at the (unshifted) input."""
    solver = as_solver(sa_pipe.sched)
    shape = (1, 4, sa_pipe.sample_size)
    xt = jax.random.normal(jax.random.PRNGKey(0), shape)
    z = jax.random.normal(jax.random.PRNGKey(1), shape)
    k = jnp.asarray(1)
    prev, x0_pred = forward_directional(sa_pipe.sched, sa_pair, xt, k, z, 3.0)
    eps_u, eps_c = sa_pair(xt, xt, k)
    guided = eps_u + 3.0 * (eps_c - eps_u)
    ref = convert_model_output(solver._sched, k, xt, guided)
    np.testing.assert_allclose(np.asarray(x0_pred), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert prev.shape == shape


def test_directional_shift_is_unit_coefficient(sa_pipe, sa_pair):
    """EDM parameterization: the x0-space shift enters x_t with coefficient
    1 (DDIM uses sqrt(abar_t)); a shifted call equals calling on xt+v."""
    shape = (1, 4, sa_pipe.sample_size)
    xt = jax.random.normal(jax.random.PRNGKey(2), shape)
    v = jax.random.normal(jax.random.PRNGKey(3), shape) * 0.01
    z = jnp.zeros(shape)
    k = jnp.asarray(1)
    p1, x1 = forward_directional(sa_pipe.sched, sa_pair, xt, k, z, 3.0,
                                 eigvecs=v, amount=1.0)
    p2, x2 = forward_directional(sa_pipe.sched, sa_pair, xt + v, k, z, 3.0)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5,
                               atol=1e-6)


def test_apply_drift_zero_amount_matches_forward(sa_pipe, sa_pair):
    """amount=0 drift must reproduce the un-drifted solver step exactly
    (the DDIM analogue holds by the epsilon-recovery identity)."""
    shape = (1, 4, sa_pipe.sample_size)
    xt = jax.random.normal(jax.random.PRNGKey(4), shape)
    z = jax.random.normal(jax.random.PRNGKey(5), shape)
    k = jnp.asarray(1)
    solver = as_solver(sa_pipe.sched)
    st = solver.init_state(xt)
    prev, x0_pred, st_after = forward_directional(
        sa_pipe.sched, sa_pair, xt, k, z, 3.0, state=st, return_state=True)
    vec = jax.random.normal(jax.random.PRNGKey(6), shape)
    out = apply_drift(sa_pipe.sched, k, prev, x0_pred, vec, jnp.ones((1,)), z,
                      amount=0.0, xt=xt, state=st)
    np.testing.assert_allclose(np.asarray(out), np.asarray(prev),
                               rtol=1e-5, atol=1e-6)
    # nonzero drift moves the output
    out2 = apply_drift(sa_pipe.sched, k, prev, x0_pred, vec, jnp.ones((1,)), z,
                       amount=0.5, xt=xt, state=st)
    assert not np.allclose(np.asarray(out2), np.asarray(prev))


def test_get_eigenvectors_runs_with_solver_state(sa_pipe, sa_pair):
    shape = (2, 4, sa_pipe.sample_size)  # n_ev = 2
    solver = as_solver(sa_pipe.sched)
    xt = jax.random.normal(jax.random.PRNGKey(7), shape)
    z = jnp.zeros(shape)
    k = jnp.asarray(1)
    st = solver.init_state(xt[:1])
    _, x0_pred = forward_directional(sa_pipe.sched, sa_pair, xt, k, z, 3.0,
                                     state=st)
    res = get_eigenvectors(
        sa_pipe.sched, sa_pair, xt, z, jnp.ones((1,) + shape[1:]), k,
        x0_pred, jax.random.PRNGKey(8), const=1e-3, cfg_tar=3.0,
        iters=3, n_ev=2, state=st,
    )
    assert res.eigvecs.shape == shape
    assert np.isfinite(np.asarray(res.eigvecs)).all()
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(res.eigvecs).reshape(2, -1), axis=1),
        1.0, rtol=1e-4)
    assert res.eigvals.shape == (2,)


def test_pc_extract_and_apply_cli_stable_audio(tmp_path):
    """End-to-end: tiny-stable-audio PC extraction -> npz checkpoint ->
    drift application (the CLIs previously raised NotImplementedError for
    this family)."""
    from audioeditingcode_tpu.cli import pc_apply, pc_extract

    sr = 4000
    t = np.arange(2 * sr, dtype=np.float32) / sr
    clip = tmp_path / "clip.wav"
    wavfile.write(str(clip), sr,
                  (0.4 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16))

    ckpt = pc_extract.main([
        "--model_id", "test/tiny-stable-audio", "--init_aud", str(clip),
        "--num_diffusion_steps", "4", "--drift_start", "3", "--drift_end", "1",
        "--iters", "2", "--n_evs", "1",
        "--results_path", str(tmp_path / "r"), "--seed", "0",
    ])
    assert ckpt.endswith(".npz") and os.path.exists(ckpt)

    outs = pc_apply.main([
        "--extraction_path", ckpt, "--drift_start", "3", "--drift_end", "1",
        "--amount", "2.0", "--seed", "0",
    ])
    assert outs and all(os.path.exists(o) for o in outs)
    rate, wav = wavfile.read(outs[0])
    assert rate == 4000 and wav.size > 0


def test_pc_extract_bf16_overridden_to_f32(tmp_path):
    """Regression: --dtype bfloat16 extraction produced NaN eigvectors (the
    finite-difference probe at const=1e-3 sits below bf16's mantissa
    quantization, collapsing the power-iteration direction to zero norm).
    The CLI must warn, override to float32, and record float32 in the
    checkpoint args so pc_apply follows suit."""
    import json
    import pytest

    from audioeditingcode_tpu.cli import pc_extract

    sr = 4000
    t = np.arange(2 * sr, dtype=np.float32) / sr
    clip = tmp_path / "clip.wav"
    wavfile.write(str(clip), sr,
                  (0.4 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16))

    with pytest.warns(UserWarning, match="unsound"):
        ckpt = pc_extract.main([
            "--model_id", "test/tiny-stable-audio", "--init_aud", str(clip),
            "--num_diffusion_steps", "4", "--drift_start", "3",
            "--drift_end", "1", "--iters", "2", "--n_evs", "1",
            "--dtype", "bfloat16",
            "--results_path", str(tmp_path / "r"), "--seed", "0",
        ])
    d = np.load(ckpt, allow_pickle=True)
    assert not np.isnan(d["eig_vals"]).any()
    assert not np.isnan(d["eig_vecs"]).any()
    assert json.loads(str(d["args_json"]))["dtype"] == "float32"
