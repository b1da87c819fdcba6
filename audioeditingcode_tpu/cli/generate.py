"""Standalone generation CLI: text-to-audio, style transfer, inpainting/SR.

Flag-compatible with the reference's vendored ``python -m audioldm`` CLI
(reference: code/audioldm/__main__.py + pipeline.py:107-301): ``-t`` text
prompt, ``-f`` source file (presence switches to style transfer),
``--transfer_strength``, ``--duration``, ``--guidance_scale``,
``--ddim_steps``, ``--n_candidate_gen_per_text``, plus ``--mode inpaint``
with a time-window mask and ``--mode sr`` (super-resolution = regenerate a
mel-frequency band, reference pipeline.py:249-301's
``freq_mask_ratio_start_and_end``).
"""

from __future__ import annotations

import argparse
import os
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from ..editing.cfg import build_cfg_tensors
from ..editing.generate import (
    inpaint_latents,
    style_transfer_latents,
    text_to_audio_latents,
)
from ..models.registry import load_model, resolve_spec
from ..utils.audio_io import load_audio, write_wav
from .common import dump_run_summary, set_reproducibility, timestamp_name


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Text-to-audio generation")
    p.add_argument("-t", "--text", type=str, default="")
    p.add_argument("-f", "--file_path", type=str, default=None,
                   help="source wav: presence switches to style transfer")
    p.add_argument("--mode", type=str, default=None,
                   choices=[None, "generation", "transfer", "inpaint", "sr"])
    p.add_argument("--transfer_strength", type=float, default=0.5)
    p.add_argument("-s", "--seed", type=int, default=42)
    p.add_argument("--model_id", type=str, default="cvssp/audioldm-s-full-v2")
    p.add_argument("-dur", "--duration", type=float, default=10.0)
    p.add_argument("-gs", "--guidance_scale", type=float, default=2.5)
    p.add_argument("-n", "--n_candidate_gen_per_text", type=int, default=1)
    p.add_argument("--ddim_steps", type=int, default=200)
    p.add_argument("--ddim_eta", type=float, default=1.0)
    p.add_argument("--inpaint_window", type=float, nargs=2, default=None,
                   help="seconds [start, end] to regenerate (inpaint mode)")
    p.add_argument("--time_mask_ratio", type=float, nargs=2, default=None,
                   help="fraction [start, end] of the time axis to "
                        "regenerate (reference time_mask_ratio_start_and_end)")
    p.add_argument("--freq_mask_ratio", type=float, nargs=2, default=None,
                   help="fraction [start, end] of the mel-bin axis to "
                        "regenerate; sr mode defaults to 0.75 1.0 (reference "
                        "freq_mask_ratio_start_and_end)")
    p.add_argument("--noise_sampler", type=str, default="brownian",
                   choices=["brownian", "iid"],
                   help="Stable Audio solver variance noise: 'brownian' "
                        "matches the reference's BrownianTreeNoiseSampler "
                        "path-consistency (models.py:1305-1312); 'iid' is "
                        "marginally identical per-run")
    p.add_argument("--save_path", type=str, default="./output")
    p.add_argument("--weights_dir", type=str, default=None)
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    return p


def _main_stable_audio(args, mode, pipe, rng, seed):
    """Text-to-audio and style transfer on the Stable Audio family (beyond
    the reference, whose standalone generation CLI is AudioLDM-only —
    audioldm/pipeline.py:107-301): sample x_T = sigma_max * n (or noise the
    source latent to sigmas[skip]) and run the 2nd-order SDE-DPM-Solver++
    reverse loop as one scan."""
    from ..editing.generate import inpaint_latents_cosine
    from ..editing.sdedit import sdedit_loop_cosine
    from ..editing.solvers import as_solver

    if mode == "sr":
        raise NotImplementedError(
            "sr regenerates mel-frequency bands; Stable Audio latents are "
            "waveform codes — use --mode inpaint with a time window"
        )
    n = args.n_candidate_gen_per_text
    S = pipe.sched.num_inference_steps
    max_s = pipe.audio_vae_length / pipe.sample_rate
    pipe.setup_duration(0.0, min(args.duration, max_s))

    if mode == "generation":
        w0 = jnp.zeros((n, pipe.dit.config.in_channels, pipe.sample_size),
                       jnp.float32)
        skip = 0  # x_t = 0 + sigmas[0] * noise = pure sigma_max noise
    else:
        if not args.file_path or not os.path.exists(args.file_path):
            raise FileNotFoundError(f"--file_path: {args.file_path}")
        x0, _, dur = load_audio(args.file_path, pipe.mel_config, stft=False,
                                model_sr=pipe.get_sr())
        pipe.setup_duration(0.0, min(dur, max_s))
        rng, enc_rng = jax.random.split(rng)
        w0 = jnp.repeat(pipe.vae_encode(jnp.asarray(x0), rng=enc_rng), n, axis=0)
        # skip == S means a 0-length loop: strength 0 returns the input
        # exactly (sigmas[S] == 0), matching the mel path's passthrough
        skip = min(max(int(round(S * (1.0 - args.transfer_strength))), 0), S)

    # conditioning travels as jit arguments like params (closure constants
    # bloat the program and can exceed the remote compiler's payload limit)
    bundle = {
        "params": pipe.params_dict(),
        "uncond": pipe.encode_text([""], negative=True),
        "cond": pipe.encode_text([args.text or ""]),
    }

    def _step_noise(n_skip):
        """Solver variance noise rows for steps n_skip..S, host-built and
        shipped as a jit argument (None = sample i.i.d. inside the scan)."""
        if args.noise_sampler != "brownian":
            return None
        from ..schedulers.brownian import brownian_noise_for_sigmas

        sigmas = np.asarray(as_solver(pipe.sched).sched.sigmas)
        return jnp.asarray(brownian_noise_for_sigmas(
            seed, sigmas[n_skip:], w0.shape))

    if mode == "inpaint":
        # regenerate the union of the masked regions, like the mel branch;
        # time windows in latent frames (sample_rate / hop_length per s)
        mask = np.zeros(w0.shape, np.float32)
        any_flag = (args.inpaint_window is not None
                    or args.time_mask_ratio is not None)
        if args.inpaint_window is not None:
            per_s = pipe.sample_rate / pipe.hop_length
            f0, f1 = (int(s * per_s) for s in args.inpaint_window)
            mask[:, :, f0:f1] = 1.0
        if args.time_mask_ratio is not None:
            t0, t1 = (int(r * w0.shape[2]) for r in args.time_mask_ratio)
            mask[:, :, t0:t1] = 1.0
        if not any_flag:
            mask[...] = 1.0  # no window given: regenerate everything
        elif not mask.any():
            raise ValueError(
                "inpaint window selects nothing (out of range or empty) — "
                "the output would silently equal the source")

        @jax.jit
        def gen(b, w0, mask, r, zs):
            p = pipe.bind(b["params"])
            eps_pair = p.make_eps_pair(b["uncond"], b["cond"])
            w = inpaint_latents_cosine(as_solver(p.sched), eps_pair, w0, mask,
                                       r, args.guidance_scale, noises=zs)
            return p.decode_to_mel(p.vae_decode(w))

        audio = np.asarray(gen(bundle, w0, jnp.asarray(mask), rng,
                               _step_noise(0)))
    else:
        @jax.jit
        def gen(b, w0, r, zs):
            p = pipe.bind(b["params"])
            eps_pair = p.make_eps_pair(b["uncond"], b["cond"])
            w = sdedit_loop_cosine(as_solver(p.sched), eps_pair, w0, r, skip,
                                   args.guidance_scale, noises=zs)
            return p.decode_to_mel(p.vae_decode(w))

        audio = np.asarray(gen(bundle, w0, rng, _step_noise(skip)))

    os.makedirs(args.save_path, exist_ok=True)
    base = (args.text or "generation").replace(" ", "_")[:60]
    outs = []
    for i in range(n):
        out = os.path.join(args.save_path, f"{base}_{timestamp_name()}_{i}.wav")
        write_wav(out, audio[i], pipe.get_sr())
        outs.append(out)
        print(f"[+] saved {out}")
    dump_run_summary(args.save_path, args, {"seed": seed, "mode": mode})
    return outs


def main(argv=None):
    args = build_parser().parse_args(argv)
    mode = args.mode or ("transfer" if args.file_path else "generation")
    seed = set_reproducibility(args.seed)
    rng = jax.random.PRNGKey(seed)
    if args.weights_dir is None:
        warnings.warn("--weights_dir not given: running with RANDOM weights.")

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    # latent time length: duration * 102.4 mel frames / VAE downscale
    frames = int(args.duration * 102.4)
    pipe = load_model(args.model_id, args.ddim_steps,
                      weights_dir=args.weights_dir, dtype=dtype,
                      latent_time=max(frames // 4, 8))
    spec = resolve_spec(args.model_id)
    if spec.family == "stable-audio":
        return _main_stable_audio(args, mode, pipe, rng, seed)

    n = args.n_candidate_gen_per_text
    lat_w = (spec.mel.n_mel_channels if spec.mel else 64) // pipe.vae_pad_multiple
    shape = (n, spec.unet.in_channels, max(frames // 4, 8), lat_w)

    w0 = None
    if mode != "generation":
        if not args.file_path or not os.path.exists(args.file_path):
            raise FileNotFoundError(f"--file_path: {args.file_path}")
        x0, _, _ = load_audio(args.file_path, pipe.mel_config, stft=True,
                              model_sr=pipe.get_sr())
        w0 = pipe.vae_encode(jnp.asarray(x0))
        w0 = jnp.repeat(w0, n, axis=0)
        shape = tuple(w0.shape)

    uncond = pipe.encode_text([""] * 1, negative=True)
    cond = pipe.encode_text([args.text]) if args.text else None
    cfg_t, _ = build_cfg_tensors(
        (1,) + shape[1:], [args.text or ""], [args.guidance_scale],
        zero_empty_prompts=(args.text == ""),
    )
    model_params = pipe.params_dict()

    def make_denoise(p):
        den1 = p.make_denoiser(uncond, cond, cfg_t if cond is not None else None)

        def denoise(xt, k):  # batch the n candidates through the CFG closure
            outs = [den1(xt[i: i + 1], k) for i in range(n)]
            return jnp.concatenate(outs, axis=0)

        return denoise

    if mode == "generation":
        w = jax.jit(lambda mp, r: text_to_audio_latents(
            pipe.sched, make_denoise(pipe.bind(mp)), shape, r,
            eta=args.ddim_eta))(model_params, rng)
    else:
        if mode == "transfer":
            w = jax.jit(lambda mp, r: style_transfer_latents(
                pipe.sched, make_denoise(pipe.bind(mp)), w0, r,
                args.transfer_strength, eta=args.ddim_eta))(model_params, rng)
        else:  # inpaint / sr: regenerate the union of the masked regions
            if mode == "sr" and args.freq_mask_ratio is None:
                args.freq_mask_ratio = [0.75, 1.0]
            mask = np.zeros(w0.shape, np.float32)
            lat_t, lat_f = w0.shape[2], w0.shape[3]
            any_flag = (args.inpaint_window is not None
                        or args.time_mask_ratio is not None
                        or args.freq_mask_ratio is not None)
            if args.inpaint_window is not None:
                f0 = int(args.inpaint_window[0] * 102.4 / pipe.vae_pad_multiple)
                f1 = int(args.inpaint_window[1] * 102.4 / pipe.vae_pad_multiple)
                mask[:, :, f0:f1, :] = 1.0
            if args.time_mask_ratio is not None:
                t0, t1 = (int(r * lat_t) for r in args.time_mask_ratio)
                mask[:, :, t0:t1, :] = 1.0
            if args.freq_mask_ratio is not None:
                b0, b1 = (int(r * lat_f) for r in args.freq_mask_ratio)
                mask[:, :, :, b0:b1] = 1.0
            if not any_flag:
                mask[...] = 1.0  # no window given: regenerate everything
            elif not mask.any():
                raise ValueError(
                    "inpaint window selects nothing (out of range or empty)"
                    " — the output would silently equal the source")
            w = jax.jit(lambda mp, r: inpaint_latents(
                pipe.sched, make_denoise(pipe.bind(mp)), w0, jnp.asarray(mask),
                r, eta=args.ddim_eta))(model_params, rng)

    x_dec = pipe.vae_decode(w)
    audio = np.asarray(pipe.decode_to_mel(x_dec))

    os.makedirs(args.save_path, exist_ok=True)
    base = (args.text or "generation").replace(" ", "_")[:60]
    outs = []
    for i in range(n):
        out = os.path.join(args.save_path, f"{base}_{timestamp_name()}_{i}.wav")
        write_wav(out, audio[i: i + 1], pipe.get_sr())
        outs.append(out)
        print(f"[+] saved {out}")
    dump_run_summary(args.save_path, args, {"seed": seed, "mode": mode})
    return outs


if __name__ == "__main__":
    main()
