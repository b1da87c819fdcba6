"""SDEdit baseline CLI — flag-compatible with code/main_run_sdedit.py."""

from __future__ import annotations

import argparse
import os
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from ..editing.sdedit import sdedit_loop, sdedit_loop_cosine
from ..models.registry import load_model, resolve_spec
from ..utils.audio_io import load_audio, write_wav
from .common import (
    dump_run_summary,
    init_wandb,
    save_spectrogram_png,
    set_reproducibility,
)
from .run import MODEL_CHOICES


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--device_num", type=int, default=0)
    p.add_argument("-s", "--seed", type=int, default=None)
    p.add_argument("--model_id", type=str, choices=MODEL_CHOICES,
                   default="cvssp/audioldm2-music")
    p.add_argument("--init_aud", type=str, required=True)
    p.add_argument("--cfg_tar", type=float, default=12)
    p.add_argument("--num_diffusion_steps", type=int, default=200)
    p.add_argument("--target_prompt", type=str, nargs="+", default=[""])
    p.add_argument("--target_neg_prompt", type=str, nargs="+", default=[""])
    p.add_argument("--results_path", default="sdedit")
    p.add_argument("--tstart", type=int, default=100)
    p.add_argument("--weights_dir", type=str, default=None)
    p.add_argument("--dtype", type=str, default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--wandb_name", type=str, default=None)
    p.add_argument("--wandb_group", type=str, default=None)
    p.add_argument("--wandb_disable", action="store_true")
    p.add_argument("--noise_sampler", type=str, default="brownian",
                   choices=["brownian", "iid"],
                   help="Stable Audio only: solver variance noise source. "
                        "'brownian' mirrors the reference's "
                        "BrownianTreeNoiseSampler used whenever no recovered "
                        "noise is supplied (models.py:1305-1312)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.eta = 1.0
    if not os.path.exists(args.init_aud):
        raise FileNotFoundError(f"--init_aud: no such file: {args.init_aud}")
    seed = set_reproducibility(args.seed)
    rng = jax.random.PRNGKey(seed)

    skip = args.num_diffusion_steps - args.tstart
    image_name = f"s{args.seed}_skip{skip}_cfg{args.cfg_tar}"
    wandb = init_wandb(args, "sdedit", image_name)

    if args.weights_dir is None:
        warnings.warn("--weights_dir not given: running with RANDOM weights.")

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    pipe = load_model(args.model_id, args.num_diffusion_steps,
                      weights_dir=args.weights_dir, dtype=dtype)
    spec = resolve_spec(args.model_id)
    stable_audio = spec.family == "stable-audio"

    x0, sr, duration = load_audio(
        args.init_aud, pipe.mel_config,
        stft=not stable_audio, model_sr=pipe.get_sr(),
    )
    x0 = jnp.asarray(x0)
    if stable_audio:
        max_s = pipe.audio_vae_length / pipe.sample_rate
        pipe.setup_duration(0.0, min(duration, max_s))
        rng, enc_rng = jax.random.split(rng)
        w0 = pipe.vae_encode(x0, rng=enc_rng)
    else:
        w0 = pipe.vae_encode(x0)

    uncond = pipe.encode_text(args.target_neg_prompt, negative=True)
    tgt = pipe.encode_text(args.target_prompt)

    if stable_audio:
        if args.noise_sampler == "brownian":
            from ..schedulers.brownian import brownian_noise_for_sigmas

            sigmas = np.asarray(pipe.sched.sched.sigmas)
            zs = jnp.asarray(
                brownian_noise_for_sigmas(seed, sigmas[skip:], w0.shape))
        else:
            zs = None

        # zs travels as a jit ARGUMENT (closure capture would bake a
        # (runs, C, L) constant into the HLO — remote-compile payload limit)
        @jax.jit
        def run(params, w0, rng, zs):
            p = pipe.bind(params)
            eps_pair = p.make_eps_pair(uncond, tgt)
            return sdedit_loop_cosine(p.sched, eps_pair, w0, rng, skip=skip,
                                      cfg_tar=float(args.cfg_tar), noises=zs)
    else:
        zs = None

        @jax.jit
        def run(params, w0, rng, zs):
            p = pipe.bind(params)
            eps_pair = p.make_eps_pair(uncond, tgt)
            return sdedit_loop(p.sched, eps_pair, w0, rng, skip=skip,
                               cfg_tar=float(args.cfg_tar), eta=args.eta)

    xt = run(pipe.params_dict(), w0, rng, zs)

    x_dec = pipe.vae_decode(xt)
    audio = np.asarray(pipe.decode_to_mel(x_dec))
    orig_audio = np.asarray(pipe.decode_to_mel(x0))

    save_path = os.path.join(
        args.results_path,
        args.model_id.split("/")[1] if "/" in args.model_id else args.model_id,
        os.path.basename(args.init_aud).split(".")[0],
        "pmt_" + "__".join(x.replace(" ", "_") for x in args.target_prompt)
        + "__neg__" + "__".join(x.replace(" ", "_") for x in args.target_neg_prompt),
    )
    os.makedirs(save_path, exist_ok=True)

    if audio.ndim == 3:  # stable-audio waveform (B, C, T)
        audio = audio[0]
    if orig_audio.ndim == 3:
        orig_audio = orig_audio[0]
    if not stable_audio:
        save_spectrogram_png(os.path.join(save_path, image_name + ".png"),
                             np.asarray(x_dec))
    write_wav(os.path.join(save_path, image_name + ".wav"), audio, sr)
    write_wav(os.path.join(save_path, "orig.wav"), orig_audio, sr)
    dump_run_summary(save_path, args, {"seed": seed, "duration": duration})
    print(f"[+] saved {os.path.join(save_path, image_name + '.wav')}")
    wandb.finish()
    return os.path.join(save_path, image_name + ".wav")


if __name__ == "__main__":
    main()
