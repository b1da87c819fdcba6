"""Long-form text-based editing: chunk -> vmapped batched edit -> crossfade.

New capability with no reference equivalent (the reference bounds editable
duration by model sample_size — SURVEY §5; TANGO hard-fails past ~16.6 s,
reference models.py:444-445): split a recording of arbitrary length into
overlapping windows, run the edit-friendly-inversion edit on EVERY window
inside one jitted vmap (window axis sharded over 'dp' on a mesh), decode +
vocode in one batched graph, and stitch with a linear crossfade.

Mel families chunk in mel frames; Stable Audio chunks in the waveform
domain (its fixed ~47 s VAE window becomes the per-chunk budget).
"""

from __future__ import annotations

import argparse
import os
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from ..editing.cfg import build_cfg_tensors
from ..editing.invert import (
    inversion_forward_process,
    inversion_reverse_process,
)
from ..editing.longform import (
    dp_constraint,
    overlap_add,
    split_windows,
    window_starts,
)
from ..models.registry import load_model, resolve_spec
from ..utils.audio_io import load_audio, write_wav
from .common import dump_run_summary, set_reproducibility, timestamp_name
from .run import MODEL_CHOICES, maybe_shard_pipeline

MEL_FPS = 102.4  # mel frames per second (reference utils.py:62)
SAMPLES_PER_FRAME = 160  # HiFi-GAN upsampling product (hifigan config)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Edit long audio in chunks")
    p.add_argument("--model_id", type=str, choices=MODEL_CHOICES,
                   default="cvssp/audioldm2-music")
    p.add_argument("--init_aud", type=str, required=True)
    p.add_argument("--cfg_src", type=float, default=3.0)
    p.add_argument("--cfg_tar", type=float, default=12.0)
    p.add_argument("--num_diffusion_steps", type=int, default=200)
    p.add_argument("--target_prompt", type=str, required=True)
    p.add_argument("--source_prompt", type=str, default="")
    p.add_argument("--target_neg_prompt", type=str, default="")
    p.add_argument("--tstart", type=int, default=100)
    p.add_argument("--chunk_seconds", type=float, default=10.0)
    p.add_argument("--overlap_seconds", type=float, default=1.0)
    p.add_argument("--results_path", type=str, default="results_long")
    p.add_argument("-s", "--seed", type=int, default=None)
    p.add_argument("--weights_dir", type=str, default=None)
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--dp", type=int, default=1,
                   help="shard the window axis over 'dp'")
    p.add_argument("--sp", type=int, default=None,
                   help="sequence-parallel ways (Stable Audio only): shard "
                        "each window's DiT latent sequence axis")
    return p


def _main_stable_audio(args, seed, rng):
    """Long-form editing on the Stable Audio family (beyond the reference,
    which trims everything to the model's fixed ~47 s window —
    models.py:1118-1134): waveform-domain overlapping windows, each edited
    by the same solver-history-threaded inversion as main_run.py's
    stable-audio path (run.py:221-237) inside ONE vmapped scan program
    (window axis sharded over 'dp'), decoded batched and stitched with a
    linear crossfade."""
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    pipe = load_model(args.model_id, args.num_diffusion_steps,
                      weights_dir=args.weights_dir, dtype=dtype)
    mesh = maybe_shard_pipeline(pipe, args.dp, args.tp,
                                getattr(args, "sp", None))
    sr = pipe.sample_rate
    max_s = pipe.audio_vae_length / sr

    x0_full, _, duration = load_audio(args.init_aud, pipe.mel_config,
                                      stft=False, model_sr=sr)
    x0_full = np.asarray(x0_full)  # (C, T) peak-normalized waveform

    win = int(round(min(args.chunk_seconds, max_s) * sr))
    ov = min(int(round(args.overlap_seconds * sr)), win - 1)
    hop = win - ov
    T_samp = x0_full.shape[-1]
    starts = window_starts(T_samp, win, hop)
    if T_samp <= win:  # one (possibly short) window; vae_encode zero-pads
        wins = x0_full[None]
    else:  # window_starts pulls the last start back: every slice is exact
        wins = np.stack([x0_full[:, s: s + win] for s in starts], axis=0)
    n_win = wins.shape[0]

    # every window is padded to the fixed audio_vae_length inside
    # vae_encode; the decode crop is the window length
    pipe.setup_duration(0.0, min(win / sr, max_s))
    rng, enc_rng = jax.random.split(rng)
    w0 = pipe.vae_encode(jnp.asarray(wins), rng=enc_rng)  # (N, 64, L)

    win_shape = (1,) + tuple(w0.shape[1:])
    uncond = pipe.encode_text([args.target_neg_prompt], negative=True)
    empty = pipe.encode_text([""], negative=True)
    src = pipe.encode_text([args.source_prompt]) if args.source_prompt else None
    tgt = pipe.encode_text([args.target_prompt])
    cfg_src_t, _ = build_cfg_tensors(win_shape, [args.source_prompt],
                                     [args.cfg_src], zero_empty_prompts=True)
    cfg_tar_t, _ = build_cfg_tensors(win_shape, [args.target_prompt],
                                     [args.cfg_tar])
    tstart = min(args.tstart, args.num_diffusion_steps)

    bundle = {
        "params": pipe.params_dict(),
        "sched": pipe.sched,
        "uncond": uncond, "empty": empty, "src": src, "tgt": tgt,
        "cfg_src_t": cfg_src_t, "cfg_tar_t": cfg_tar_t,
    }

    @jax.jit
    def edit_all(b, w0b, keys):
        """vmapped single-window stable-audio edit: 2nd-order solver
        history threaded from the forward into the reverse scan per
        window, window axis sharded over 'dp'."""
        p = pipe.bind({**b["params"], "sched": b["sched"]})
        fwd_den = p.make_denoiser(b["empty"], b["src"], b["cfg_src_t"])
        rev_den = p.make_denoiser(b["uncond"], b["tgt"], b["cfg_tar_t"])

        def one(w0_win, k):
            _, zs, xts, extras = inversion_forward_process(
                p.sched, fwd_den, w0_win, k, eta=args.eta,
                numerical_fix=args.numerical_fix, return_extras=True)
            return inversion_reverse_process(
                p.sched, rev_den, xts, zs[:tstart], eta=args.eta,
                init_history=extras[tstart - 1])

        out = jax.vmap(one)(dp_constraint(w0b, mesh), keys)
        return out[:, 0]  # (N, 1, C, L) -> (N, C, L)

    from ..ops.flash_attention import sp_mesh_scope

    keys = jax.random.split(rng, n_win)
    # sp_mesh_scope routes DiT self-attention through the shard_map Pallas
    # kernel under --sp (trace-time dispatch); no-op without an sp axis
    with sp_mesh_scope(mesh):
        w_edit = edit_all(bundle, w0[:, None], keys)

    @jax.jit
    def decode(params, w):
        return pipe.bind(params).vae_decode(w)

    audio = np.asarray(decode(pipe.params_dict(), w_edit))  # (N, 2, ~win)
    if audio.shape[-1] != win:
        # int(win/sr * sr) in the decode crop can lose a sample to float
        # round-trip; realign so every window overlays at its exact start
        if audio.shape[-1] > win:
            audio = audio[..., :win]
        else:
            audio = np.pad(audio, [(0, 0)] * (audio.ndim - 1)
                           + [(0, win - audio.shape[-1])])
    stitched = overlap_add(audio.astype(np.float32), starts, T_samp)

    save_path = os.path.join(
        args.results_path,
        args.model_id.split("/")[-1],
        os.path.basename(args.init_aud).split(".")[0],
    )
    os.makedirs(save_path, exist_ok=True)
    name = (f"long_cfg_e_{args.cfg_src}_cfg_d_{args.cfg_tar}"
            f"_tstart_{tstart}_chunk_{args.chunk_seconds}_{timestamp_name()}")
    out_path = os.path.join(save_path, name + ".wav")
    write_wav(out_path, stitched, sr)
    dump_run_summary(save_path, args, {
        "seed": seed, "duration": duration, "n_windows": n_win,
        "win_samples": win, "hop_samples": hop,
    })
    print(f"[+] saved {out_path} ({n_win} windows, {duration:.1f} s)")
    return out_path


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.eta = 1.0
    args.numerical_fix = True
    if not os.path.exists(args.init_aud):
        raise FileNotFoundError(f"--init_aud: no such file: {args.init_aud}")
    seed = set_reproducibility(args.seed)
    rng = jax.random.PRNGKey(seed)
    if args.weights_dir is None:
        warnings.warn("--weights_dir not given: running with RANDOM weights.")

    spec = resolve_spec(args.model_id)
    if spec.family == "stable-audio":
        return _main_stable_audio(args, seed, rng)
    if (getattr(args, "sp", None) or 1) > 1:
        raise ValueError("--sp shards the DiT latent sequence axis; it "
                         "requires a stable-audio model")

    # window geometry in mel frames, multiples of the VAE pad (4)
    win = max(int(round(args.chunk_seconds * MEL_FPS / 4)) * 4, 8)
    ov = min(int(round(args.overlap_seconds * MEL_FPS / 4)) * 4, win - 4)
    hop = win - ov

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    pipe = load_model(args.model_id, args.num_diffusion_steps,
                      weights_dir=args.weights_dir, dtype=dtype,
                      latent_time=max(win // 4, 8))
    mesh = maybe_shard_pipeline(pipe, args.dp, args.tp)

    x0_full, sr, duration = load_audio(args.init_aud, pipe.mel_config,
                                       stft=True, model_sr=pipe.get_sr())
    wins, starts = split_windows(np.asarray(x0_full), win, hop)
    n_win = wins.shape[0]
    w0 = pipe.vae_encode(jnp.asarray(wins))  # (N, C, win/4, 16)

    win_shape = (1,) + tuple(w0.shape[1:])
    uncond = pipe.encode_text([args.target_neg_prompt], negative=True)
    empty = pipe.encode_text([""], negative=True)
    src = pipe.encode_text([args.source_prompt]) if args.source_prompt else None
    tgt = pipe.encode_text([args.target_prompt])
    cfg_src_t, _ = build_cfg_tensors(win_shape, [args.source_prompt],
                                     [args.cfg_src], zero_empty_prompts=True)
    cfg_tar_t, _ = build_cfg_tensors(win_shape, [args.target_prompt],
                                     [args.cfg_tar])
    tstart = min(args.tstart, args.num_diffusion_steps)

    bundle = {
        "params": pipe.params_dict(),
        "sched": pipe.sched,
        "uncond": uncond, "empty": empty, "src": src, "tgt": tgt,
        "cfg_src_t": cfg_src_t, "cfg_tar_t": cfg_tar_t,
    }

    @jax.jit
    def edit_all(b, w0b, keys):
        """vmapped single-window edit: window axis sharded over 'dp',
        single-window CFG semantics preserved exactly."""
        p = pipe.bind({**b["params"], "sched": b["sched"]})
        fwd_den = p.make_denoiser(b["empty"], b["src"], b["cfg_src_t"])
        rev_den = p.make_denoiser(b["uncond"], b["tgt"], b["cfg_tar_t"])

        def one(w0_win, k):
            _, zs, xts = inversion_forward_process(
                p.sched, fwd_den, w0_win, k, eta=args.eta,
                numerical_fix=args.numerical_fix)
            return inversion_reverse_process(p.sched, rev_den, xts,
                                             zs[:tstart], eta=args.eta)

        out = jax.vmap(one)(dp_constraint(w0b, mesh), keys)
        return out[:, 0]  # (N, 1, C, h, w) -> (N, C, h, w)

    keys = jax.random.split(rng, n_win)
    w_edit = edit_all(bundle, w0[:, None], keys)

    @jax.jit
    def decode(params, w):
        p = pipe.bind(params)
        return p.decode_to_mel(p.vae_decode(w))

    audio = np.asarray(decode(pipe.params_dict(), w_edit))  # (N, 1, Tw) or (N, Tw)
    if audio.ndim == 2:
        audio = audio[:, None]

    starts_samples = [s * SAMPLES_PER_FRAME for s in starts]
    # the frontend computed int(duration * 102.4) mel frames (audio_io.py);
    # rounding here instead would append a zero-weight silent frame
    total = max(x0_full.shape[2], win) * SAMPLES_PER_FRAME
    stitched = overlap_add(audio.astype(np.float32), starts_samples, total)

    save_path = os.path.join(
        args.results_path,
        args.model_id.split("/")[-1],
        os.path.basename(args.init_aud).split(".")[0],
    )
    os.makedirs(save_path, exist_ok=True)
    name = (f"long_cfg_e_{args.cfg_src}_cfg_d_{args.cfg_tar}"
            f"_tstart_{tstart}_chunk_{args.chunk_seconds}_{timestamp_name()}")
    out_path = os.path.join(save_path, name + ".wav")
    write_wav(out_path, stitched, sr)
    dump_run_summary(save_path, args, {
        "seed": seed, "duration": duration, "n_windows": n_win,
        "win_frames": win, "hop_frames": hop,
    })
    print(f"[+] saved {out_path} ({n_win} windows, {duration:.1f} s)")
    return out_path


if __name__ == "__main__":
    main()
