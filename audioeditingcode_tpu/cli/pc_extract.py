"""Unsupervised PC-extraction CLI — flag-compatible with
code/main_pc_extract_inv.py.

Pipeline: edit-friendly inversion (one scan), then per-timestep subspace
power iteration over the drift window. The n_ev eigenvector batch and the
cond/uncond pair are fused into single UNet forwards; each timestep's
50-iteration power loop is one jitted scan. Checkpoints (reference
:245-250) land once after the single compiled trajectory scan and then
after every ts_chunk of extracted timesteps.
"""

from __future__ import annotations

import argparse
import os
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from ..editing.invert import inversion_forward_process
from ..editing.pc_drift import (
    PCStreamChoice,
    forward_directional,
    get_eigenvectors,
    snapshot_iterations,
)
from ..editing.pcdata import save_extraction, step_timestep_key
from ..models.registry import load_model, resolve_spec
from ..models.text_encoders import repeat_cond
from ..utils.audio_io import load_audio, write_wav
from .common import (
    dump_run_summary,
    init_wandb,
    save_spectrogram_png,
    set_reproducibility,
    timestamp_name,
)
from .run import MODEL_CHOICES


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Extract PCs for a real audio signal")
    p.add_argument("--device_num", type=int, default=0)
    p.add_argument("-s", "--seed", type=int, default=None)
    p.add_argument("--cfg_tar", type=float, nargs="+", default=[3])
    p.add_argument("--model_id", type=str, choices=MODEL_CHOICES,
                   default="cvssp/audioldm2-music")
    p.add_argument("--init_aud", type=str, required=True)
    p.add_argument("--num_diffusion_steps", type=int, default=200)
    p.add_argument("--source_prompt", type=str, nargs="+", default=[""])
    p.add_argument("--target_neg_prompt", type=str, nargs="+", default=[""])
    p.add_argument("--corr_to_swap", type=float, default=0.8)
    p.add_argument("--drift_start", type=int, default=None)
    p.add_argument("--drift_end", type=int, default=None)
    p.add_argument("--results_path", default="pc_extractions")
    p.add_argument("-c", "--const", type=float, default=1e-3)
    p.add_argument("--n_evs", type=int, default=1)
    p.add_argument("-p", "--patch", nargs=2, default=None, type=int)
    p.add_argument("-t", "--iters", type=int, default=50)
    p.add_argument("-d", "--dry", action="store_true")
    p.add_argument("--weights_dir", type=str, default=None)
    p.add_argument("--dtype", type=str, default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--wandb_name", type=str, default=None)
    p.add_argument("--wandb_group", type=str, default=None)
    p.add_argument("--wandb_disable", action="store_true")
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--dp", type=int, default=1,
                   help="shard the n_evs power-iteration batch over 'dp'")
    p.add_argument("--ts_chunk", type=int, default=1,
                   help="run this many timesteps' power iterations in one "
                        "batched (vmapped) program; with --dp the chunk axis "
                        "shards over the mesh. Each timestep's iteration is "
                        "independent given the precomputed trajectory "
                        "(reference main_pc_extract_inv.py:199-243).")
    return p


def parse_args(argv=None):
    """Parse + apply the reference's hidden post-parse args
    (main_pc_extract_inv.py:65-69: pc_mode='both', eta=1.,
    numerical_fix=True, double_precision=False, test_rand_gen=False)."""
    args = build_parser().parse_args(argv)
    args.pc_mode = "both"
    args.eta = 1.0
    args.numerical_fix = True
    args.double_precision = False
    args.test_rand_gen = False
    return args


def main(argv=None):
    args = parse_args(argv)
    if not os.path.exists(args.init_aud):
        raise FileNotFoundError(f"--init_aud: no such file: {args.init_aud}")

    seed = set_reproducibility(args.seed)
    rng = jax.random.PRNGKey(seed)
    cfg_tar = float(np.atleast_1d(args.cfg_tar)[0])

    ts_name = timestamp_name()
    image_name = (
        f"s{args.seed}_"
        + (f"p{args.patch[0]}-{args.patch[1]}_" if args.patch is not None else "")
        + f"pc-{args.pc_mode}_cfgd{args.cfg_tar}_"
        + f"drift{args.drift_start}-{args.drift_end}_it{args.iters}_c{args.const:.1e}"
        + f"_{ts_name}"
    )
    wandb = init_wandb(args, "pc_extraction_inv", image_name)

    if args.weights_dir is None:
        warnings.warn("--weights_dir not given: running with RANDOM weights.")

    if args.dtype == "bfloat16":
        # Power iteration probes the denoiser Jacobian by finite differences
        # at const=1e-3 (reference pc_drift.py:140-177): the per-element
        # perturbation (~1e-3/sqrt(N)) sits far BELOW bfloat16's ~8-bit
        # mantissa quantization of the latent, so at bf16 the probe
        # difference collapses to zero norm and the renormalization emits
        # NaN eigvectors (measured: tiny-stable-audio extraction produced
        # NaN eigvals). The reference runs extraction in fp32 with an fp64
        # option (main_pc_extract_inv.py:65-69 double_precision); fp32 is
        # the minimum sound precision, so override and say so.
        warnings.warn("--dtype bfloat16 is numerically unsound for "
                      "finite-difference PC extraction (probe below bf16 "
                      "quantization); overriding to float32.")
        args.dtype = "float32"
    pipe = load_model(args.model_id, args.num_diffusion_steps,
                      weights_dir=args.weights_dir, dtype=jnp.float32)
    spec = resolve_spec(args.model_id)
    from .run import maybe_shard_pipeline

    mesh = maybe_shard_pipeline(pipe, getattr(args, "dp", 1), getattr(args, "tp", 1))
    args._mesh = mesh
    stable_audio = spec.family == "stable-audio"
    S = args.num_diffusion_steps

    if args.drift_start is None:
        args.drift_start = S
    if args.drift_end is None:
        args.drift_end = -1
    drift_start_it = S - args.drift_start
    drift_end_it = S - args.drift_end

    x0, sr, duration = load_audio(args.init_aud, pipe.mel_config,
                                  stft=not stable_audio, model_sr=pipe.get_sr())
    x0 = jnp.asarray(x0)
    if stable_audio:
        # beyond the reference (its forward_directional is DDIM-bound,
        # pc_drift.py:29-93): the cosine DPM solver drives the directional
        # steps through the same solver seam
        max_s = pipe.audio_vae_length / pipe.sample_rate
        pipe.setup_duration(0.0, min(duration, max_s))
        rng, enc_rng = jax.random.split(rng)
        w0 = pipe.vae_encode(x0, rng=enc_rng)
    else:
        w0 = pipe.vae_encode(x0)

    save_path = os.path.join(
        args.results_path,
        args.model_id.split("/")[1] if "/" in args.model_id else args.model_id,
        os.path.basename(args.init_aud).split(".")[0],
        "pmt_" + "__".join(x.replace(" ", "_") for x in args.source_prompt)
        + "__neg__" + "__".join(x.replace(" ", "_") for x in args.target_neg_prompt),
    )
    os.makedirs(save_path, exist_ok=True)

    ckpt_path, xt = run_pc_extraction(
        args, pipe, w0, rng, cfg_tar, save_path, image_name, seed
    )

    # correlation diagnostics (reference: main_pc_extract_inv.py:222-231)
    from ..editing.pcdata import load_extraction
    from .common import plot_corrs

    loaded = load_extraction(ckpt_path[: -len(".npz")])
    plot_corrs(loaded.get("corrs", []), loaded.get("in_corrs", []),
               args.n_evs, save_path=save_path)

    # wandb diagnostics: per-PC eigenvalues + power-method convergence
    # (reference: main_pc_extract_inv.py:222-231)
    from .common import log_pc_corrs

    eigdata = loaded.get("eigdata", {})
    eigvals = [eigdata[t]["eigval"] for t in sorted(eigdata)] if eigdata else []
    log_pc_corrs(wandb, loaded.get("corrs", []), loaded.get("in_corrs", []),
                 eigvals, args.n_evs)

    # final decode of the (drift-free) trajectory end
    x_dec = pipe.vae_decode(xt)
    audio = np.asarray(pipe.decode_to_mel(x_dec))
    orig_audio = np.asarray(pipe.decode_to_mel(x0))
    if audio.ndim == 3:  # stable-audio waveform (B, C, T)
        audio = audio[0]
    if orig_audio.ndim == 3:
        orig_audio = orig_audio[0]
    if not stable_audio:
        save_spectrogram_png(os.path.join(save_path, image_name + ".png"),
                             np.asarray(x_dec))
    write_wav(os.path.join(save_path, image_name + ".wav"), audio, sr)
    write_wav(os.path.join(save_path, "orig.wav"), orig_audio, sr)
    dump_run_summary(save_path, args, {"seed": seed})

    from .common import log_edit_artifacts

    log_edit_artifacts(
        wandb, image_name, sr,
        orig_audio=np.squeeze(orig_audio).T if orig_audio.ndim > 1 else orig_audio,
        gen_audio=np.squeeze(audio).T if audio.ndim > 1 else audio,
        gen_spec=None if stable_audio else np.squeeze(np.asarray(x_dec)),
    )
    print(f"[+] extraction saved to {ckpt_path}")
    wandb.finish()
    return ckpt_path


def run_pc_extraction(args, pipe, w0, rng, cfg_tar, save_path, image_name, seed):
    """Shared PC-extraction driver: edit-friendly inversion, per-timestep
    power iteration in the drift window, incremental npz checkpoints.

    Used by both the audio CLI (main_pc_extract_inv.py parity) and the image
    CLI (images_pc_extract_inv.py parity). Returns (ckpt_path, final xt)."""
    S = args.num_diffusion_steps
    drift_start_it = S - args.drift_start
    drift_end_it = S - args.drift_end

    uncond = pipe.encode_text(args.target_neg_prompt, negative=True)
    has_src = len(args.source_prompt) > 1 or args.source_prompt[0] != ""
    src = pipe.encode_text(args.source_prompt) if has_src else None
    text = pipe.encode_text(args.source_prompt)

    # edit-friendly inversion (reference :135-140)
    from ..editing.cfg import build_cfg_tensors

    cfg_t, _ = build_cfg_tensors(w0.shape, args.source_prompt, [cfg_tar],
                                 zero_empty_prompts=True)
    empty = pipe.encode_text([""], negative=True)
    rng, r_inv = jax.random.split(rng)

    @jax.jit
    def invert(params, w, r):
        p = pipe.bind(params)
        fwd_den = p.make_denoiser(empty, src, cfg_t)
        return inversion_forward_process(
            p.sched, fwd_den, w, r, eta=args.eta, numerical_fix=args.numerical_fix
        )

    _, zs, wts = invert(pipe.params_dict(), w0, r_inv)

    # latents[0] = x_T; latents[it+1] = z used at iteration it (:142-143)
    latents = jnp.concatenate([wts[S: S + 1], jnp.flip(zs, axis=0)], axis=0)

    mask = np.zeros(w0.shape, dtype=np.float32)  # (1, C, H, W) | (1, C, L)
    if args.patch is not None:
        if len(args.patch) == 4:  # image CLI: (top, bottom, left, right)
            mask[:, :, args.patch[0]: args.patch[1],
                 args.patch[2]: args.patch[3]] = 1
        elif mask.ndim == 3:  # stable-audio 1-D latent: time-axis patch
            mask[:, :, args.patch[0]: args.patch[1]] = 1
        else:  # audio CLI: time-axis patch (reference main_pc_extract_inv)
            mask[:, :, args.patch[0]: args.patch[1], :] = 1
    else:
        mask[...] = 1
    mask_j = jnp.asarray(mask)

    n_ev = args.n_evs
    ts_chunk = max(1, int(getattr(args, "ts_chunk", 1)))
    uncond_ev = repeat_cond(uncond, n_ev)
    text_ev = repeat_cond(text, n_ev)

    @jax.jit
    def traj_scan(params, x_start, lats):
        """Full deterministic trajectory in ONE scan (2 UNet fwd per step),
        returning every xt, x0_pred and the INCOMING multistep solver state
        per step — the power iterations only need these precomputed states
        (reference main_pc_extract_inv.py:199-243 runs forward_directional
        per step in Python; DDIM-family states are empty pytrees)."""
        p = pipe.bind(params)
        eps_pair = p.make_eps_pair(uncond, text)
        from ..editing.solvers import as_solver

        st0 = as_solver(p.sched, eta=args.eta).init_state(x_start)

        def step(carry, inp):
            xt, st = carry
            k, lat = inp
            xt_m1, x0_pred, st_new = forward_directional(
                p.sched, eps_pair, xt, k, lat, cfg_tar, eta=args.eta,
                state=st, return_state=True)
            return (xt_m1, st_new), (xt_m1, x0_pred, st)

        _, (xts_seq, x0_preds, states_seq) = jax.lax.scan(
            step, (x_start, st0), (jnp.arange(S), lats))
        return xts_seq, x0_preds, states_seq

    mesh = getattr(args, "_mesh", None)

    def _shard(x, axis_name="dp"):
        if mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P(axis_name, *([None] * (x.ndim - 1))))
        return jax.lax.with_sharding_constraint(x, sh)

    def eig_one(params, xt, k, latent, x0_pred, r, st, dp_on_ev: bool):
        """Power iteration for ONE timestep with the n_ev batch fused into
        the UNet batch dimension."""
        p = pipe.bind(params)
        eps_pair_ev = p.make_eps_pair(uncond_ev, text_ev)
        xt_ev = jnp.repeat(xt, n_ev, axis=0)
        x0_ev = jnp.repeat(x0_pred, n_ev, axis=0)
        lat_ev = jnp.repeat(latent, n_ev, axis=0)
        if dp_on_ev:
            xt_ev, x0_ev, lat_ev = map(_shard, (xt_ev, x0_ev, lat_ev))
        res = get_eigenvectors(
            p.sched, eps_pair_ev, xt_ev, lat_ev, mask_j, k, x0_ev, r,
            mode=PCStreamChoice.BOTH, const=args.const, cfg_tar=cfg_tar,
            iters=args.iters, eta=args.eta, n_ev=n_ev, state=st,
        )
        # drop the static snapshot_iters tuple: vmap maps array leaves only
        return res._asdict() | {"snapshot_iters": None}

    @jax.jit
    def eig_step(params, xt, k, latent, x0_pred, r, st):
        return eig_one(params, xt, k, latent, x0_pred, r, st, dp_on_ev=True)

    @jax.jit
    def eig_chunk(params, xt_c, k_c, lat_c, x0_c, r_c, st_c):
        """ts_chunk timesteps' power iterations as one batched program —
        independent given the trajectory, so the chunk axis vmaps and shards
        over the 'dp' mesh axis (near-linear multi-chip scaling at n_ev=1)."""
        xt_c, lat_c, x0_c = map(_shard, (xt_c, lat_c, x0_c))
        return jax.vmap(
            lambda xt, k, lat, x0p, r, st: eig_one(params, xt, k, lat, x0p, r,
                                                   st, dp_on_ev=False)
        )(xt_c, k_c, lat_c, x0_c, r_c, st_c)

    ckpt_path = os.path.join(save_path, image_name + ".npz")

    model_params = pipe.params_dict()
    prev_pc = None
    eig_ts, eig_its = [], []
    eig_vecs, eig_vals, interm_vecs, interm_vals, norm_factors = [], [], [], [], []
    corrs, in_corrs, in_norms = [], [], []
    snaps = snapshot_iterations(args.iters)
    from ..editing.solvers import as_solver

    host_solver = as_solver(pipe.sched, eta=args.eta)
    sched_obj = getattr(pipe.sched, "sched", pipe.sched)
    timesteps = np.asarray(sched_obj.timesteps)

    def _save():
        save_extraction(
            ckpt_path, vars(args) | {"seed": seed, "cfg_tar_scalar": cfg_tar},
            eig_ts, eig_its,
            np.asarray(eig_vecs) if eig_vecs else np.zeros((0,)),
            np.asarray(eig_vals) if eig_vals else np.zeros((0,)),
            np.asarray(interm_vecs) if interm_vecs else np.zeros((0,)),
            np.asarray(interm_vals) if interm_vals else np.zeros((0,)),
            list(snaps),
            np.asarray(norm_factors) if norm_factors else np.zeros((0,)),
            np.asarray(corrs) if corrs else np.zeros((0,)),
            np.asarray(in_corrs) if in_corrs else np.zeros((0,)),
            np.asarray(in_norms) if in_norms else np.zeros((0,)),
            np.asarray(latents),
            np.asarray(xts_list),
        )

    # Phase A — the whole deterministic trajectory in one compiled scan.
    xts_seq, x0_preds, states_seq = traj_scan(model_params, latents[0], latents[1:])
    xts_np = np.asarray(xts_seq)
    x0_np = np.asarray(x0_preds)
    xts_list = [np.asarray(latents[0])] + list(xts_np)
    _save()  # trajectory checkpoint before the expensive extraction phase

    # Phase B — power iterations over the drift window. Each timestep only
    # needs its precomputed (xt, latent, x0_pred), so ts_chunk of them run as
    # one batched program, sharded over the 'dp' mesh axis.
    window = [] if args.dry else [
        it for it in range(S) if drift_start_it <= it < drift_end_it
    ]
    keys = []
    for _ in window:  # same split order as a sequential loop
        rng, r_eig = jax.random.split(rng)
        keys.append(r_eig)

    def xt_at(it):  # state BEFORE step it
        return xts_list[it]

    def state_at(it):  # incoming multistep solver state at step it
        return jax.tree.map(lambda a: a[it], states_seq)

    def record(it, vecs, res_np):
        nonlocal prev_pc
        corr = None
        if it > drift_start_it and prev_pc is not None:
            corr = np.sum(prev_pc.reshape(n_ev, -1) * vecs.reshape(n_ev, -1),
                          axis=1)
            for ev in range(n_ev):
                if corr[ev] <= -args.corr_to_swap:
                    vecs[ev] *= -1
                    corr[ev] *= -1
                    print(f"swapped eigvec {ev + 1}!")
            corrs.append(corr)
        prev_pc = vecs
        eig_ts.append(step_timestep_key(timesteps, it))
        eig_its.append(it)
        eig_vecs.append(vecs)
        eig_vals.append(res_np["eigvals"])
        interm_vecs.append(res_np["interm_eigvecs"])
        interm_vals.append(res_np["interm_eigvals"])
        norm_factors.append(float(host_solver.x0_shift_coeff(it)))
        in_corrs.append(res_np["in_corrs"])
        in_norms.append(res_np["in_norms"])

    for start in range(0, len(window), ts_chunk):
        chunk = window[start: start + ts_chunk]
        if ts_chunk == 1:
            it = chunk[0]
            res = eig_step(model_params, xt_at(it), jnp.asarray(it),
                           latents[it + 1], x0_np[it], keys[start],
                           state_at(it))
            res_np = {n: np.asarray(v) for n, v in res.items()
                      if v is not None}
            record(it, res_np.pop("eigvecs"), res_np)
        else:
            # pad the tail chunk so every dispatch reuses one compiled shape
            pad = chunk + [chunk[-1]] * (ts_chunk - len(chunk))
            xt_c = jnp.asarray(np.stack([xt_at(i) for i in pad]))
            k_c = jnp.asarray(np.asarray(pad))
            lat_c = latents[jnp.asarray([i + 1 for i in pad])]
            x0_c = jnp.asarray(x0_np[np.asarray(pad)])
            r_c = jnp.stack(
                [keys[start + min(j, len(chunk) - 1)]
                 for j in range(ts_chunk)])
            st_c = jax.tree.map(lambda a: a[jnp.asarray(pad)], states_seq)
            res = eig_chunk(model_params, xt_c, k_c, lat_c, x0_c, r_c, st_c)
            res_host = {n: np.asarray(v) for n, v in res.items()
                        if v is not None}
            for j, it in enumerate(chunk):
                res_np = {n: v[j] for n, v in res_host.items()}
                record(it, res_np.pop("eigvecs"), res_np)
        _save()
    _save()
    return ckpt_path, jnp.asarray(xts_list[-1])


if __name__ == "__main__":
    main()
