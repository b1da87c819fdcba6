"""PC drift application CLI — flag-compatible with code/main_pc_apply_drift.py.

Loads a PC-extraction checkpoint, re-runs the deterministic trajectory and
applies drift along the chosen PCs inside [drift_start, drift_end), with
optional patch mask + fade + fix_alpha blending against the stored
trajectory, per-ev or combined (--combine_evs), and the --rand_v
random-vector baseline.
"""

from __future__ import annotations

import argparse
import os
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from ..editing.pc_drift import apply_drift, forward_directional
from ..editing.pcdata import load_extraction, step_timestep_key
from ..models.registry import load_model
from ..models.text_encoders import repeat_cond
from ..utils.audio_io import write_wav
from .common import dump_run_summary, init_wandb, save_spectrogram_png, set_reproducibility


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("Apply extracted PCs to audio")
    p.add_argument("--device_num", type=int, default=0)
    p.add_argument("-s", "--seed", type=int, default=None)
    p.add_argument("--extraction_path", type=str, required=True)
    p.add_argument("--drift_start", type=int, required=True)
    p.add_argument("--drift_end", type=int, required=True)
    p.add_argument("--amount", type=float, required=True)
    p.add_argument("--use_specific_ts_pc", type=int, default=None)
    p.add_argument("--fix_alpha", type=float, default=None)
    p.add_argument("--fade_length", type=float, default=0.0)
    p.add_argument("--evs", type=int, nargs="+", default=[1])
    p.add_argument("--combine_evs", action="store_true")
    p.add_argument("--evals_pt", type=str, default=None,
                   help="Precomputed averaged eigenvalues (.npz mapping t->eigvals)")
    p.add_argument("--rand_v", action="store_true")
    p.add_argument("--weights_dir", type=str, default=None)
    p.add_argument("--dtype", type=str, default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--wandb_name", type=str, default=None)
    p.add_argument("--wandb_group", type=str, default=None)
    p.add_argument("--wandb_disable", action="store_true")
    return p


def parse_args(argv=None):
    """Parse + apply the reference's hidden post-parse args
    (main_pc_apply_drift.py:37-38: shift_x0_for_np=True, sub_iters=None)."""
    args = build_parser().parse_args(argv)
    args.shift_x0_for_np = True
    args.sub_iters = None
    return args


def main(argv=None):
    args = parse_args(argv)
    if args.drift_start < args.drift_end:
        raise ValueError("Drift start must be greater than drift end")

    seed = set_reproducibility(args.seed)
    for suffix in (".pt", ".npz"):
        if args.extraction_path.endswith(suffix):
            args.extraction_path = args.extraction_path[: -len(suffix)]

    run_name = (
        f"drift{args.drift_start}-{args.drift_end}"
        f'{"_spts" + str(args.use_specific_ts_pc) if args.use_specific_ts_pc is not None else ""}'
        f'{"_shiftx0-4np" if args.shift_x0_for_np else ""}'
        f'{f"fix{args.fix_alpha}" if args.fix_alpha is not None else ""}'
        f'{"_fade" + str(args.fade_length) if args.fade_length > 0 else ""}'
        f'{"_avgeval" if args.evals_pt is not None else ""}'
        f'{"_RAND" if args.rand_v else ""}'
        f"_a{args.amount}"
    )
    wandb = init_wandb(args, "pc_application", run_name)

    load = load_extraction(args.extraction_path)
    ex_args = load["args"]
    eigdata = load["eigdata"]
    latents = jnp.asarray(load["latents"])
    xts = jnp.asarray(load["xts"]) if args.fix_alpha is not None else None

    rng = np.random.default_rng(seed)
    if args.rand_v:
        for k in eigdata:
            v = eigdata[k]["eigvec"]
            norm = np.linalg.norm(v)
            r = rng.standard_normal(v.shape).astype(np.float32)
            eigdata[k]["eigvec"] = r / np.linalg.norm(r) * norm

    # fade length in latent frames (reference :91-94)
    args.fade_length = int(args.fade_length * latents.shape[3] / 15)

    S = int(ex_args.num_diffusion_steps)
    if args.weights_dir is None and getattr(ex_args, "weights_dir", None):
        args.weights_dir = ex_args.weights_dir
    if args.weights_dir is None:
        warnings.warn("running with RANDOM weights.")

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    pipe = load_model(ex_args.model_id, S, weights_dir=args.weights_dir, dtype=dtype)
    cfg_tar = float(getattr(ex_args, "cfg_tar_scalar", np.atleast_1d(ex_args.cfg_tar)[0]))
    eta = float(ex_args.eta)

    xt = run_pc_application(args, pipe, ex_args, eigdata, latents, xts, cfg_tar, eta)

    drifts_path = args.extraction_path + "_driftgens"
    os.makedirs(drifts_path, exist_ok=True)

    x_dec = jnp.concatenate(
        [pipe.vae_decode(xt[i: i + 1]) for i in range(xt.shape[0])], axis=0
    )
    # rows: (T,) mel-family mono or (C, T) stable-audio stereo — both are
    # write_wav-compatible per row
    audio = np.asarray(pipe.decode_to_mel(x_dec))

    def out_name(prefix):
        return (
            f"{prefix}_drift{args.drift_start}-{args.drift_end}"
            f'{"_spts" + str(args.use_specific_ts_pc) if args.use_specific_ts_pc is not None else ""}'
            f"_it{ex_args.iters if args.sub_iters is None else args.sub_iters}"
            f"_shiftednp{args.shift_x0_for_np}"
            f'{"_fade" + str(args.fade_length) if args.fade_length > 0 else ""}'
            f'{f"_fix{args.fix_alpha}" if args.fix_alpha is not None else ""}'
            f'{"_avgeval" if args.evals_pt is not None else ""}'
            f'{"_RAND" if args.rand_v else ""}'
            f"_a{args.amount}.wav"
        )

    outputs = []
    if args.combine_evs:
        name = out_name(f'pcs{"".join(str(x) for x in args.evs)}')
        write_wav(os.path.join(drifts_path, name), audio[0], pipe.get_sr())
        outputs.append(os.path.join(drifts_path, name))
    else:
        for ev_idx, ev_num in enumerate(args.evs):
            name = out_name(f"pc{ev_num}")
            write_wav(os.path.join(drifts_path, name),
                      audio[min(ev_idx, audio.shape[0] - 1)], pipe.get_sr())
            outputs.append(os.path.join(drifts_path, name))

    if x_dec.ndim == 4:  # mel-family spectrograms only
        save_spectrogram_png(os.path.join(drifts_path, "drift_spec.png"),
                             np.asarray(x_dec))
    dump_run_summary(drifts_path, args, {"seed": seed})
    for o in outputs:
        print(f"[+] saved {o}")
    wandb.finish()
    return outputs


def run_pc_application(args, pipe, ex_args, eigdata, latents, xts, cfg_tar, eta):
    """Shared drift-application driver (audio + image CLIs): re-run the
    deterministic trajectory and apply PC drift inside the window.
    Returns the final latent batch (one row per ev, or one if combined).

    TWO compiled scans instead of S per-step dispatches: a batch-1
    trajectory scan up to the drift window, then a batch-n_out drift scan
    with all eigvectors/eigvalues uploaded once as stacked scan inputs
    (the per-step loop re-uploaded them host->device every iteration).
    Verified against the literal per-step reference loop in
    tests/test_pc_apply_equiv.py."""
    S = int(ex_args.num_diffusion_steps)
    uncond = pipe.encode_text(list(ex_args.target_neg_prompt), negative=True)
    text = pipe.encode_text(list(ex_args.source_prompt))

    evals_override = None
    if args.evals_pt is not None:
        z = np.load(args.evals_pt)
        evals_override = {int(k): z[k] for k in z.files}

    # mask + fade (reference :107-118)
    mask = None
    if args.fix_alpha is not None:
        m = np.zeros(np.asarray(latents[0]).shape, dtype=np.float32)
        patch = getattr(ex_args, "patch", None)
        if patch is not None and len(patch) == 4:  # image: top/bottom/left/right
            m[:, :, patch[0]: patch[1], patch[2]: patch[3]] = 1
        elif patch is not None and m.ndim == 3:  # stable-audio 1-D latent
            m[:, :, patch[0]: patch[1]] = 1
            fl = args.fade_length
            if fl > 0:
                ramp = np.linspace(0, 1, fl, dtype=np.float32)[None, None, :]
                m[:, :, patch[0] - fl: patch[0]] = ramp
                m[:, :, patch[1]: patch[1] + fl] = ramp[:, :, ::-1]
        elif patch is not None:  # audio: time-axis window with optional fade
            m[:, :, patch[0]: patch[1], :] = 1
            fl = args.fade_length
            if fl > 0:
                ramp = np.linspace(0, 1, fl, dtype=np.float32)[None, None, :, None]
                m[:, :, patch[0] - fl: patch[0], :] = ramp
                m[:, :, patch[1]: patch[1] + fl, :] = ramp[:, :, ::-1, :]
        else:
            m[...] = 1
        mask = jnp.asarray(m)

    drift_start_it = max(S - args.drift_start, 0)
    drift_end_it = S - args.drift_end
    timesteps = np.asarray(getattr(pipe.sched, "sched", pipe.sched).timesteps)

    n_out = 1 if args.combine_evs else len(args.evs)
    uncond_n = repeat_cond(uncond, n_out)
    text_n = repeat_cond(text, n_out)
    model_params = pipe.params_dict()
    fix = args.fix_alpha is not None and xts is not None
    pxt_all = xts if fix else jnp.zeros_like(latents)

    # ---- phase A: batch-1 trajectory up to the window (one scan) --------
    from ..editing.solvers import as_solver

    a_end = min(drift_start_it, S)

    @jax.jit
    def traj_scan(params, xt, lats):
        p = pipe.bind(params)
        pair = p.make_eps_pair(uncond, text)
        st0 = as_solver(p.sched, eta=eta).init_state(xt)

        def body(carry, inp):
            xt, st = carry
            k, latent = inp
            xt, _, st = forward_directional(p.sched, pair, xt, k, latent,
                                            cfg_tar, eta=eta, state=st,
                                            return_state=True)
            return (xt, st), None

        (xt, st), _ = jax.lax.scan(body, (xt, st0), (jnp.arange(a_end), lats))
        return xt, st

    xt = latents[0]
    state = as_solver(pipe.sched, eta=eta).init_state(xt)
    if a_end > 0:
        xt, state = traj_scan(model_params, xt, latents[1: a_end + 1])
    if a_end >= S:
        return xt

    # ---- phase B: batch-n_out drift scan over [a_end, S) ----------------
    # stack per-step eig data on the host ONCE (zeros past the window; the
    # gate keeps those steps pure-trajectory)
    n_ev = next(iter(eigdata.values()))["eigvec"].shape[0] if eigdata else 1
    lat_shape = tuple(np.asarray(latents[0]).shape[1:])
    L = S - a_end
    vecs = np.zeros((L, n_ev) + lat_shape, np.float32)
    vals = np.zeros((L, n_ev), np.float32)
    gate = np.zeros((L,), bool)
    for it in range(a_end, S):
        if drift_start_it <= it < drift_end_it:
            t_val = step_timestep_key(timesteps, it)
            use_t = (t_val if args.use_specific_ts_pc is None
                     else step_timestep_key(timesteps, S - args.use_specific_ts_pc))
            vecs[it - a_end] = np.asarray(eigdata[use_t]["eigvec"]).reshape(
                (n_ev,) + lat_shape)
            vals[it - a_end] = (np.asarray(evals_override[t_val])
                                if evals_override is not None
                                else np.asarray(eigdata[t_val]["eigval"]))
            gate[it - a_end] = True

    # rows are identical entering the window, so widening the batch up
    # front reproduces the reference's batch-1 first window step exactly
    if xt.shape[0] == 1 and n_out > 1:
        xt = jnp.repeat(xt, n_out, axis=0)
    # widen multistep history to the output batch (no-op for DDIM's ())
    state = jax.tree.map(
        lambda a: jnp.repeat(a, n_out, axis=0)
        if getattr(a, "ndim", 0) > 0 and a.shape[0] == 1 and n_out > 1 else a,
        state)

    sel = None if args.combine_evs is False else [e - 1 for e in args.evs]

    @jax.jit
    def drift_scan(params, xt, st, lats, pxts, vecs, vals, gate):
        p = pipe.bind(params)
        pair = p.make_eps_pair(uncond_n, text_n)

        def body(carry, inp):
            xt, st = carry
            k, latent, pxt, vec, val, g = inp
            lat_b = jnp.repeat(latent, n_out, axis=0) if n_out > 1 else latent
            xt_m1, x0_pred, st_fwd = forward_directional(
                p.sched, pair, xt, k, lat_b, cfg_tar, eta=eta,
                state=st, return_state=True)
            if args.combine_evs:
                drift, st_drift = apply_drift(
                    p.sched, k, xt_m1, x0_pred,
                    vec[jnp.asarray(sel)], val[jnp.asarray(sel)], latent,
                    eta=eta, amount=args.amount,
                    use_shifted_x0_for_noisepred=args.shift_x0_for_np,
                    xt=xt, state=st, return_state=True,
                )
            else:
                outs, sts = [], []
                for ev_idx, ev_num in enumerate(args.evs):
                    o, s_ev = apply_drift(
                        p.sched, k,
                        xt_m1[ev_idx: ev_idx + 1], x0_pred[ev_idx: ev_idx + 1],
                        vec[ev_num - 1: ev_num], val[ev_num - 1: ev_num],
                        latent, eta=eta, amount=args.amount,
                        use_shifted_x0_for_noisepred=args.shift_x0_for_np,
                        xt=xt[ev_idx: ev_idx + 1],
                        state=jax.tree.map(
                            lambda a: a[ev_idx: ev_idx + 1]
                            if getattr(a, "ndim", 0) > 0 else a, st),
                        return_state=True,
                    )
                    outs.append(o)
                    sts.append(s_ev)
                drift = jnp.concatenate(outs, axis=0)
                st_drift = jax.tree.map(
                    lambda *a: jnp.concatenate(a, axis=0)
                    if getattr(a[0], "ndim", 0) > 0 else a[0], *sts)
            if fix:
                drift = mask * drift + (1 - mask) * (
                    args.fix_alpha * pxt + (1 - args.fix_alpha) * drift)
            xt_new = jnp.where(g, drift, xt_m1)
            st_new = jax.tree.map(
                lambda a, b: jnp.where(g, a, b), st_drift, st_fwd)
            return (xt_new, st_new), None

        ks = jnp.arange(a_end, S)
        (xt, _), _ = jax.lax.scan(
            body, (xt, st), (ks, lats, pxts, vecs, vals, gate))
        return xt

    return drift_scan(model_params, xt, state, latents[a_end + 1: S + 1],
                      pxt_all[a_end + 1: S + 1], jnp.asarray(vecs),
                      jnp.asarray(vals), jnp.asarray(gate))


if __name__ == "__main__":
    main()
