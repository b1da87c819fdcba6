"""run_pc_application must match a straightforward per-step reference loop
(the literal transcription of code/main_pc_apply_drift.py:141-191) for
every drift mode: per-ev, combined, and fix_alpha mask blending."""

import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audioeditingcode_tpu.editing.pc_drift import apply_drift, forward_directional
from audioeditingcode_tpu.models.registry import load_model
from audioeditingcode_tpu.models.text_encoders import repeat_cond

S = 6
N_EV = 2


@pytest.fixture(scope="module")
def setup():
    pipe = load_model("test/tiny-audioldm", num_diffusion_steps=S, latent_time=16)
    rng = jax.random.PRNGKey(0)
    shape = (1, 4, 16, 32)
    latents = jax.random.normal(rng, (S + 1,) + shape)
    xts = jax.random.normal(jax.random.fold_in(rng, 1), (S + 1,) + shape)
    timesteps = np.asarray(pipe.sched.timesteps)
    eigdata = {}
    for it in range(S):
        v = np.asarray(jax.random.normal(jax.random.fold_in(rng, 10 + it),
                                         (N_EV,) + shape[1:]))
        v = v / np.linalg.norm(v.reshape(N_EV, -1), axis=1).reshape(N_EV, 1, 1, 1)
        eigdata[int(timesteps[it])] = {
            "eigvec": v[:, None] if False else v.reshape((N_EV,) + shape[1:]),
            "eigval": np.abs(np.asarray(
                jax.random.normal(jax.random.fold_in(rng, 50 + it), (N_EV,)))),
        }
    # eigvec entries need the latent's (1, C, H, W)-style shape per ev
    for t in eigdata:
        eigdata[t]["eigvec"] = eigdata[t]["eigvec"].reshape((N_EV,) + shape[1:])
    return pipe, latents, xts, eigdata, timesteps


def reference_loop(args, pipe, eigdata, latents, xts, cfg_tar, eta, timesteps):
    """Literal transcription of the reference per-step loop."""
    uncond = pipe.encode_text([""], negative=True)
    text = pipe.encode_text(["a sine"])
    n_out = 1 if args.combine_evs else len(args.evs)
    drift_start_it = S - args.drift_start
    drift_end_it = S - args.drift_end
    mask = None
    if args.fix_alpha is not None:
        m = np.zeros(np.asarray(latents[0]).shape, np.float32)
        if args.patch is not None:
            m[:, :, args.patch[0]: args.patch[1], :] = 1
        else:
            m[...] = 1
        mask = jnp.asarray(m)

    xt = latents[0]
    parallel_xt = xts[0] if args.fix_alpha is not None else None
    for it in range(S):
        k = jnp.asarray(it)
        latent = latents[it + 1]
        if xt.shape[0] == 1:
            pair = pipe.make_eps_pair(uncond, text)
            lat_b = latent
        else:
            pair = pipe.make_eps_pair(repeat_cond(uncond, n_out),
                                      repeat_cond(text, n_out))
            lat_b = jnp.repeat(latent, xt.shape[0], axis=0)
        xt_m1, x0_pred = forward_directional(pipe.sched, pair, xt, k, lat_b,
                                             cfg_tar, eta=eta)
        if args.fix_alpha is not None:
            parallel_xt = xts[it + 1]
        if drift_start_it <= it < drift_end_it:
            t_val = int(timesteps[it])
            vec_all = jnp.asarray(eigdata[t_val]["eigvec"])
            val_all = jnp.asarray(eigdata[t_val]["eigval"])
            if args.combine_evs:
                sel = [e - 1 for e in args.evs]
                xt_m1 = apply_drift(pipe.sched, k, xt_m1, x0_pred,
                                    vec_all[jnp.asarray(sel)],
                                    val_all[jnp.asarray(sel)], latent,
                                    eta=eta, amount=args.amount,
                                    use_shifted_x0_for_noisepred=True)
            else:
                outs = []
                for ev_idx, ev_num in enumerate(args.evs):
                    sx = xt_m1[ev_idx: ev_idx + 1] if xt_m1.shape[0] > 1 else xt_m1
                    s0 = x0_pred[ev_idx: ev_idx + 1] if x0_pred.shape[0] > 1 else x0_pred
                    outs.append(apply_drift(
                        pipe.sched, k, sx, s0,
                        vec_all[ev_num - 1: ev_num], val_all[ev_num - 1: ev_num],
                        latent, eta=eta, amount=args.amount,
                        use_shifted_x0_for_noisepred=True))
                xt_m1 = jnp.concatenate(outs, axis=0)
            if args.fix_alpha is not None:
                xt_m1 = mask * xt_m1 + (1 - mask) * (
                    args.fix_alpha * parallel_xt + (1 - args.fix_alpha) * xt_m1)
        xt = xt_m1
    return np.asarray(xt)


def make_args(**kw):
    base = dict(drift_start=5, drift_end=2, amount=1.5, evs=[1, 2],
                combine_evs=False, fix_alpha=None, fade_length=0,
                use_specific_ts_pc=None, evals_pt=None, patch=None,
                shift_x0_for_np=True)
    base.update(kw)
    return types.SimpleNamespace(**base)


def ex_args_for(pipe):
    return types.SimpleNamespace(num_diffusion_steps=S,
                                 target_neg_prompt=[""],
                                 source_prompt=["a sine"], patch=None)


@pytest.mark.parametrize("mode", ["per_ev", "combined", "fix_alpha"])
@pytest.mark.slow
def test_apply_matches_reference_loop(setup, mode):
    from audioeditingcode_tpu.cli.pc_apply import run_pc_application

    pipe, latents, xts, eigdata, timesteps = setup
    kw = {}
    if mode == "combined":
        kw = dict(combine_evs=True)
    elif mode == "fix_alpha":
        kw = dict(fix_alpha=0.3, patch=(2, 9))
    args = make_args(**kw)
    ex = ex_args_for(pipe)
    ex.patch = args.patch

    ref = reference_loop(args, pipe, eigdata, latents,
                         xts if args.fix_alpha is not None else None,
                         6.0, 1.0, timesteps)
    got = np.asarray(run_pc_application(
        args, pipe, ex, eigdata, latents,
        xts if args.fix_alpha is not None else None, 6.0, 1.0))
    assert got.shape == ref.shape
    # f32 noise between different jit partitionings on ~|40| magnitudes
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
