"""Batched multi-clip text-based editing.

New first-class capability beyond the reference (which edits one clip per
``main_run.py`` process — code/main_run.py:104-231): edit EVERY clip in a
directory (or an explicit file list) under one prompt pair, with all clips
fused into ONE vmapped edit program — the clip axis shards over 'dp' on a
device mesh — and one batched decode graph. On a saturated chip this
amortizes dispatch and text encoding; on a mesh it scales near-linearly,
turning the per-clip editing CLI into a production batch/serving tool.

Outputs land in the exact per-clip results layout of ``main_run.py``
(``edit_save_path``), so the evaluation tower (`main_evals.py`) consumes a
batch run unchanged.

Mel families pad every clip's mel to the batch maximum (multiples of the
VAE pad, zero-padded like the frontend's ``_pad_spec``) and crop each
decode back to the clip's own length — the UNet sees the pad region, so a
short clip's batched edit is close to but not bit-identical with its
``main_run.py`` edit. Stable Audio clips share the model's fixed VAE
window (reference models.py:1118-1134) and each carries its OWN duration
conditioning, exactly as per-clip runs would.
"""

from __future__ import annotations

import argparse
import glob
import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from ..editing.cfg import build_cfg_tensors
from ..editing.invert import (
    inversion_forward_process,
    inversion_reverse_process,
)
from ..editing.longform import dp_constraint
from ..models.registry import load_model, resolve_spec
from ..utils.audio_io import load_audio, write_wav
from .common import (
    dump_run_summary,
    edit_image_name,
    edit_save_path,
    save_spectrogram_png,
    set_reproducibility,
)
from .run import MODEL_CHOICES, maybe_shard_pipeline
from .run_long import SAMPLES_PER_FRAME


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Edit a batch of clips in one program")
    p.add_argument("--model_id", type=str, choices=MODEL_CHOICES,
                   default="cvssp/audioldm2-music")
    p.add_argument("--init_aud", type=str, nargs="+", required=True,
                   help="wav files, or a single directory of wavs")
    p.add_argument("--cfg_src", type=float, default=3.0)
    p.add_argument("--cfg_tar", type=float, default=12.0)
    p.add_argument("--num_diffusion_steps", type=int, default=200)
    p.add_argument("--target_prompt", type=str, required=True)
    p.add_argument("--source_prompt", type=str, default="")
    p.add_argument("--target_neg_prompt", type=str, default="")
    p.add_argument("--tstart", type=int, default=100)
    p.add_argument("--results_path", type=str, default="results")
    p.add_argument("-s", "--seed", type=int, default=None)
    p.add_argument("--weights_dir", type=str, default=None)
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--dp", type=int, default=1,
                   help="shard the clip axis over 'dp'")
    p.add_argument("--sp", type=int, default=None,
                   help="sequence-parallel ways (Stable Audio only): shard "
                        "each clip's DiT latent sequence axis")
    return p


def _collect_files(paths):
    if len(paths) == 1 and os.path.isdir(paths[0]):
        files = sorted(glob.glob(os.path.join(paths[0], "*.wav")))
        if not files:
            raise FileNotFoundError(f"no .wav files in {paths[0]}")
    else:
        for f in paths:
            if not os.path.exists(f):
                raise FileNotFoundError(f"--init_aud: no such file: {f}")
        files = list(paths)
    # results land under basename(clip): two clips sharing a basename would
    # silently overwrite each other's outputs (1 s filename timestamps).
    # Applies to the directory glob too: 'a.wav' and 'a.b.wav' collide.
    # The key MUST match edit_save_path's (common.py:65, reference
    # main_run.py:139): split('.')[0], NOT splitext — 'a.b.wav' saves as 'a'.
    seen = {}
    for f in files:
        base = os.path.basename(f).split(".")[0]
        if base in seen:
            raise ValueError(
                f"clips {seen[base]!r} and {f!r} share the results basename "
                f"{base!r}; rename one (outputs would overwrite)"
            )
        seen[base] = f
    return files


def _fit_len(wav: np.ndarray, n: int) -> np.ndarray:
    """Crop or zero-pad the trailing sample axis to exactly n samples."""
    if wav.shape[-1] >= n:
        return wav[..., :n]
    pad = [(0, 0)] * (wav.ndim - 1) + [(0, n - wav.shape[-1])]
    return np.pad(wav, pad)


def _save_clip(args, seed, clip_path, audio, x_dec, orig_audio, sr,
               stable_audio, skip, duration):
    """One clip's outputs in main_run.py's per-clip results layout."""
    save_path = edit_save_path(args.results_path, args.model_id, clip_path,
                               [args.source_prompt], [args.target_prompt],
                               [args.target_neg_prompt])
    os.makedirs(save_path, exist_ok=True)
    name = edit_image_name("ours", [args.cfg_src], [args.cfg_tar], skip,
                           args.num_diffusion_steps)
    if not stable_audio:
        save_spectrogram_png(os.path.join(save_path, name + ".png"), x_dec)
    write_wav(os.path.join(save_path, name + ".wav"), audio, sr)
    write_wav(os.path.join(save_path, "orig.wav"), orig_audio, sr)
    dump_run_summary(save_path, args, {"seed": seed, "duration": duration,
                                       "batched": True})
    return os.path.join(save_path, name + ".wav")


def main(argv=None):
    args = build_parser().parse_args(argv)
    # hidden reference defaults (main_run.py:64-66)
    args.eta = 1.0
    args.numerical_fix = True

    files = _collect_files(args.init_aud)
    n_clip = len(files)
    seed = set_reproducibility(args.seed)
    rng = jax.random.PRNGKey(seed)
    if args.weights_dir is None:
        warnings.warn("--weights_dir not given: running with RANDOM weights.")

    spec = resolve_spec(args.model_id)
    stable_audio = spec.family == "stable-audio"
    if (args.sp or 1) > 1 and not stable_audio:
        raise ValueError("--sp shards the DiT latent sequence axis; it "
                         "requires a stable-audio model")
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    tstart = min(args.tstart, args.num_diffusion_steps)
    skip = args.num_diffusion_steps - tstart

    if stable_audio:
        pipe = load_model(args.model_id, args.num_diffusion_steps,
                          weights_dir=args.weights_dir, dtype=dtype)
        mesh = maybe_shard_pipeline(pipe, args.dp, args.tp, args.sp)
        sr = pipe.sample_rate
        max_s = pipe.audio_vae_length / sr
        clips, durations = [], []
        for f in files:
            wav, _, dur = load_audio(f, None, stft=False, model_sr=sr)
            clips.append(np.asarray(wav))
            durations.append(dur)
        if len({c.shape[0] for c in clips}) > 1:
            raise ValueError(
                "batch clips must share a channel count; got "
                + ", ".join(f"{f}: {c.shape[0]}ch" for f, c in zip(files, clips))
            )
        # duration conditioning is PER CLIP (run.py conditions each edit on
        # its own clip duration): stack each clip's duration embeds/global
        # token and vmap the edit over them alongside the latents
        dur_embeds, glob_states = [], []
        for dur in durations:
            pipe.setup_duration(0.0, min(dur, max_s))
            dur_embeds.append(pipe._duration_embeds)
            glob_states.append(pipe._global_states)
        dur_embeds = jnp.stack(dur_embeds)   # (N, 1, 2, D)
        glob_states = jnp.stack(glob_states)  # (N, 1, 1, 2D)
        # decode state covers the longest clip; outputs are host-cropped
        pipe.setup_duration(0.0, min(max(durations), max_s))
        T_pad = max(c.shape[-1] for c in clips)
        x0 = np.zeros((n_clip, clips[0].shape[0], T_pad), np.float32)
        for i, c in enumerate(clips):
            x0[i, :, : c.shape[-1]] = c
        rng, enc_rng = jax.random.split(rng)
        w0 = pipe.vae_encode(jnp.asarray(x0), rng=enc_rng)  # (N, 64, L)
        frames = None
    else:
        mels, durations = [], []
        for f in files:
            mel, _, dur = load_audio(f, spec.mel, stft=True, model_sr=None)
            mels.append(np.asarray(mel))  # (1, 1, T_i, M)
            durations.append(dur)
        frames = [m.shape[2] for m in mels]
        T_pad = max(-(-max(frames) // 4) * 4, 8)
        x0 = np.zeros((n_clip, 1, T_pad, mels[0].shape[3]), np.float32)
        for i, m in enumerate(mels):
            x0[i, :, : m.shape[2]] = m[0]
        pipe = load_model(args.model_id, args.num_diffusion_steps,
                          weights_dir=args.weights_dir, dtype=dtype)
        mesh = maybe_shard_pipeline(pipe, args.dp, args.tp)
        sr = pipe.get_sr()
        w0 = pipe.vae_encode(jnp.asarray(x0))  # (N, C, T/4, M/4)

    clip_shape = (1,) + tuple(w0.shape[1:])
    uncond = pipe.encode_text([args.target_neg_prompt], negative=True)
    empty = pipe.encode_text([""], negative=True)
    src = pipe.encode_text([args.source_prompt]) if args.source_prompt else None
    tgt = pipe.encode_text([args.target_prompt])
    cfg_src_t, _ = build_cfg_tensors(clip_shape, [args.source_prompt],
                                     [args.cfg_src], zero_empty_prompts=True)
    cfg_tar_t, _ = build_cfg_tensors(clip_shape, [args.target_prompt],
                                     [args.cfg_tar])

    bundle = {
        "params": pipe.params_dict(),
        "sched": pipe.sched,
        "uncond": uncond, "empty": empty, "src": src, "tgt": tgt,
        "cfg_src_t": cfg_src_t, "cfg_tar_t": cfg_tar_t,
    }

    @jax.jit
    def edit_all(b, w0b, keys, durs, globs):
        """vmapped per-clip edit, clip axis sharded over 'dp'; single-clip
        CFG/inversion semantics as in run.py:221-256 (Stable Audio clips
        additionally carry their OWN duration conditioning; mel clips are
        zero-padded to the batch maximum, so a short clip's UNet sees the
        pad region — for bit-exact per-clip parity use main_run.py)."""
        import dataclasses as _dc

        p = pipe.bind({**b["params"], "sched": b["sched"]})

        if stable_audio:
            def one(w0_clip, k, d, g):
                pc = _dc.replace(p, _duration_embeds=d, _global_states=g)
                fwd_den = pc.make_denoiser(b["empty"], b["src"], b["cfg_src_t"])
                rev_den = pc.make_denoiser(b["uncond"], b["tgt"], b["cfg_tar_t"])
                _, zs, xts, extras = inversion_forward_process(
                    p.sched, fwd_den, w0_clip, k, eta=args.eta,
                    numerical_fix=args.numerical_fix, return_extras=True)
                return inversion_reverse_process(
                    p.sched, rev_den, xts, zs[:tstart], eta=args.eta,
                    init_history=extras[tstart - 1])

            out = jax.vmap(one)(dp_constraint(w0b, mesh), keys, durs, globs)
        else:
            fwd_den = p.make_denoiser(b["empty"], b["src"], b["cfg_src_t"])
            rev_den = p.make_denoiser(b["uncond"], b["tgt"], b["cfg_tar_t"])

            def one(w0_clip, k):
                _, zs, xts = inversion_forward_process(
                    p.sched, fwd_den, w0_clip, k, eta=args.eta,
                    numerical_fix=args.numerical_fix)
                return inversion_reverse_process(p.sched, rev_den, xts,
                                                 zs[:tstart], eta=args.eta)

            out = jax.vmap(one)(dp_constraint(w0b, mesh), keys)
        return out[:, 0]  # (N, 1, ...) -> (N, ...)

    from ..ops.flash_attention import sp_mesh_scope

    keys = jax.random.split(rng, n_clip)
    # sp_mesh_scope routes DiT self-attention through the shard_map Pallas
    # kernel under --sp (trace-time dispatch); no-op without an sp axis
    with sp_mesh_scope(mesh):
        w_edit = edit_all(bundle, w0[:, None], keys,
                          dur_embeds if stable_audio else None,
                          glob_states if stable_audio else None)

    @jax.jit
    def decode(params, w):
        p = pipe.bind(params)
        x_dec = p.vae_decode(w)
        return x_dec, p.decode_to_mel(x_dec)

    x_dec, audio = decode(pipe.params_dict(), w_edit)
    x_dec, audio = np.asarray(x_dec), np.asarray(audio)
    # original audio vocodes the ORIGINAL input (run.py:287 semantics),
    # not a VAE round-trip
    orig_audio = np.asarray(pipe.decode_to_mel(jnp.asarray(x0)))

    outputs = []
    for i, f in enumerate(files):
        if stable_audio:
            # crop to the clip's own length; pad defensively in case the
            # decode window truncated a sample (int(end_s * sr) round-trip)
            n = clips[i].shape[-1]
            a = _fit_len(audio[i], n)
            oa = _fit_len(orig_audio[i], n)
            xd = None
        else:
            n = frames[i] * SAMPLES_PER_FRAME
            a = _fit_len(audio[i].reshape(1, -1), n)
            oa = _fit_len(orig_audio[i].reshape(1, -1), n)
            xd = x_dec[i][None, :, : frames[i]]  # (1, 1, T_i, M) for the PNG
        outputs.append(_save_clip(args, seed, f, a, xd, oa, sr,
                                  stable_audio, skip, durations[i]))

    print(f"[+] batch-edited {n_clip} clips -> {args.results_path}")
    return outputs


if __name__ == "__main__":
    main()
