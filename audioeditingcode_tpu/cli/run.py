"""Text-based audio editing CLI — flag-compatible with the reference's
code/main_run.py (README.md:54-104 documents the public surface).

Differences by design:
- --weights_dir points at a converted-checkpoint directory (see
  tools/convert_checkpoint.py); without it the run uses random weights
  (useful only for smoke tests/benchmarks and clearly warned about).
- --device_num is accepted for compatibility; device selection is JAX's.
"""

from __future__ import annotations

import argparse
import os
import warnings
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..editing.cfg import build_cfg_tensors
from ..editing.ddim import ddim_generation_loop, ddim_inversion_loop
from ..editing.invert import inversion_forward_process, inversion_reverse_process
from ..models.registry import load_model, resolve_spec
from ..utils.audio_io import load_audio, write_wav
from .common import (
    dump_run_summary,
    edit_image_name,
    edit_save_path,
    init_wandb,
    save_spectrogram_png,
    set_reproducibility,
)

MODEL_CHOICES = [
    "cvssp/audioldm-s-full-v2",
    "cvssp/audioldm-l-full",
    "cvssp/audioldm2",
    "cvssp/audioldm2-large",
    "cvssp/audioldm2-music",
    "declare-lab/tango-full-ft-audio-music-caps",
    "declare-lab/tango-full-ft-audiocaps",
    "stabilityai/stable-audio-open-1.0",
    "test/tiny-audioldm",
    "test/tiny-audioldm2",
    "test/tiny-stable-audio",
]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Run text-based audio editing.")
    p.add_argument("--device_num", type=int, default=0, help="GPU device number (compat; unused)")
    p.add_argument("-s", "--seed", type=int, default=None)
    p.add_argument("--model_id", type=str, choices=MODEL_CHOICES,
                   default="cvssp/audioldm2-music")
    p.add_argument("--init_aud", type=str, required=True)
    p.add_argument("--cfg_src", type=float, nargs="+", default=[3])
    p.add_argument("--cfg_tar", type=float, nargs="+", default=[12])
    p.add_argument("--num_diffusion_steps", type=int, default=200)
    p.add_argument("--target_prompt", type=str, nargs="+", default=[""], required=True)
    p.add_argument("--source_prompt", type=str, nargs="+", default=[""])
    p.add_argument("--target_neg_prompt", type=str, nargs="+", default=[""])
    p.add_argument("--tstart", type=int, nargs="+", default=[100])
    p.add_argument("--results_path", type=str, default="results")
    p.add_argument("--cutoff_points", type=float, nargs="*", default=None)
    p.add_argument("--mode", default="ours", choices=["ours", "ddim"])
    p.add_argument("--fix_alpha", type=float, default=0.1)
    p.add_argument("--first_order", action="store_true", default=False,
                   help="Force the Stable Audio solver to first order")
    p.add_argument("--weights_dir", type=str, default=None,
                   help="Directory of converted Flax weights")
    p.add_argument("--dtype", type=str, default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--wandb_name", type=str, default=None)
    p.add_argument("--wandb_group", type=str, default=None)
    p.add_argument("--wandb_disable", action="store_true", default=True)
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of the edit into this dir")
    p.add_argument("--selfcheck", action="store_true", default=False,
                   help="reconstruction self-test: invert, then reverse with "
                        "the SOURCE prompt/cfg (instead of the target) and "
                        "report the latent reconstruction SNR — the "
                        "reference's commented-out consistency checks "
                        "(inversion_utils.py:127,305) made first-class. "
                        "'ours' mode reconstructs near-exactly (>=40 dB); "
                        "DDIM inversion is approximate.")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel ways over the device mesh")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel ways over the device mesh")
    p.add_argument("--sp", type=int, default=None,
                   help="sequence-parallel ways (Stable Audio only): shard "
                        "the DiT latent sequence axis over the mesh. An "
                        "explicit --sp 1 still routes attention through the "
                        "sp shard_map kernel path (the single-chip hardware "
                        "rehearsal of the sp lowering)")
    return p


def maybe_shard_pipeline(pipe, dp: int, tp: int, sp: Optional[int] = None):
    """Shard model params over a (dp, tp[, sp]) mesh when requested; returns
    the mesh (or None). Weight matrices shard over output channels on 'tp';
    'sp' adds a sequence axis for the Stable Audio DiT (annotate the latent
    with parallel.mesh.seq_sharding); XLA GSPMD inserts the ICI collectives.
    sp=None means 'not requested'; an EXPLICIT sp — size 1 included — builds
    the 3-axis mesh so the shard_map attention path engages (sp=1 on one
    chip is how the sp kernel lowering is rehearsed on real hardware)."""
    if sp is not None and sp < 1:
        # --sp 0 means "disabled" (the pre-sp=1-rework no-op); forwarding
        # the raw 0 to make_mesh would trip its sp >= 1 assert.
        sp = None
    sp_eff = sp or 1
    if dp * tp * sp_eff <= 1 and sp is None:
        return None
    from ..parallel.mesh import make_mesh, shard_module_params

    mesh = make_mesh(n_devices=dp * tp * sp_eff, dp=dp, tp=tp, sp=sp)
    for attr in ("unet_params", "vae_params", "vocoder_params", "dit_params"):
        params = getattr(pipe, attr, None)
        if params is not None:
            setattr(pipe, attr, shard_module_params(params, mesh))
    return mesh


def parse_args(argv=None):
    """Parse + apply the reference's hidden post-parse args
    (main_run.py:64-66: eta=1., numerical_fix=True, test_rand_gen=False)."""
    args = build_parser().parse_args(argv)
    args.eta = 1.0
    args.numerical_fix = True
    args.test_rand_gen = False
    return args


def main(argv=None):
    args = parse_args(argv)

    if not os.path.exists(args.init_aud):
        raise FileNotFoundError(f"--init_aud: no such file: {args.init_aud}")

    seed = set_reproducibility(args.seed)
    rng = jax.random.PRNGKey(seed)
    wandb = init_wandb(args, "text_edit", "run")

    if args.weights_dir is None:
        warnings.warn(
            "--weights_dir not given: running with RANDOM weights "
            "(smoke-test mode, outputs are not meaningful audio)."
        )

    if len(args.tstart) != len(args.target_prompt):
        if len(args.tstart) == 1:
            args.tstart = args.tstart * len(args.target_prompt)
        else:
            raise ValueError("T-start amount and target prompt amount don't match.")
    tstart = np.asarray(args.tstart, dtype=np.int64)
    skip = args.num_diffusion_steps - tstart

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    pipe = load_model(args.model_id, args.num_diffusion_steps,
                      weights_dir=args.weights_dir, dtype=dtype)
    spec = resolve_spec(args.model_id)
    if (args.sp or 1) > 1 and spec.family != "stable-audio":
        raise ValueError("--sp shards the DiT latent sequence axis; it "
                         "requires a stable-audio model (mel families scale "
                         "via --dp/--tp)")
    # explicit --sp 1 on a mel family is a harmless no-op (the sp path only
    # exists for the DiT), so only stable-audio threads it through
    mesh = maybe_shard_pipeline(
        pipe, args.dp, args.tp,
        args.sp if spec.family == "stable-audio" else None)

    x0, sr, duration = load_audio(
        args.init_aud, pipe.mel_config,
        stft=(spec.family != "stable-audio"), model_sr=pipe.get_sr(),
    )
    x0 = jnp.asarray(x0)
    stable_audio = spec.family == "stable-audio"
    if stable_audio:
        # duration conditioning + decode crop window (models.py:1142-1172)
        max_s = pipe.audio_vae_length / pipe.sample_rate
        pipe.setup_duration(0.0, min(duration, max_s))
        if args.first_order:
            import dataclasses as _dc
            pipe.sched = _dc.replace(pipe.sched, first_order=True)
        rng, enc_rng = jax.random.split(rng)
        w0 = pipe.vae_encode(x0, rng=enc_rng)
        if mesh is not None and "sp" in mesh.axis_names:
            # sequence-parallel: the latent L axis shards over 'sp'; GSPMD
            # propagates S-sharding through the DiT and gathers K/V at the
            # attention einsums (parallel/mesh.py)
            from ..parallel.mesh import seq_sharding
            w0 = jax.device_put(w0, seq_sharding(mesh, w0.ndim))
    else:
        w0 = pipe.vae_encode(x0)

    uncond = pipe.encode_text(args.target_neg_prompt, negative=True)
    has_src = len(args.source_prompt) > 1 or args.source_prompt[0] != ""
    src = pipe.encode_text(args.source_prompt) if has_src else None
    tgt = pipe.encode_text(args.target_prompt)

    cfg_src_t, _ = build_cfg_tensors(
        w0.shape, args.source_prompt, list(args.cfg_src),
        cutoff_points=args.cutoff_points, zero_empty_prompts=True,
    )
    cfg_tar_t, masks = build_cfg_tensors(
        w0.shape, args.target_prompt, list(args.cfg_tar),
        cutoff_points=args.cutoff_points,
    )

    if args.mode == "ddim":
        if stable_audio:
            raise ValueError(
                "--mode ddim requires a DDIM-scheduler model; Stable Audio "
                "uses the cosine DPM solver (run --mode ours)."
            )
        if len(args.cfg_src) > 1 or len(args.cfg_tar) > 1:
            raise ValueError("DDIM only supports one cfg scale value")
        if len(args.source_prompt) > 1 or len(args.target_prompt) > 1:
            raise ValueError("DDIM only supports single prompts")
        if (skip != 0).any():
            warnings.warn(
                "Plain DDIM Inversion should be run with t_start == "
                "num_diffusion_steps. You are now running partial DDIM inversion.",
                RuntimeWarning,
            )
        empty = pipe.encode_text([""], negative=True)

        @jax.jit
        def ddim_edit(params, w0):
            p = pipe.bind(params)
            fwd_den = p.make_denoiser(empty, src, cfg_src_t)
            rev_den = (fwd_den if args.selfcheck
                       else p.make_denoiser(empty, tgt, cfg_tar_t))
            wT = ddim_inversion_loop(p.sched, fwd_den, w0, skip=int(skip[0]))
            return ddim_generation_loop(p.sched, rev_den, wT, skip=int(skip[0]))

        w_edit = ddim_edit(pipe.params_dict(), w0)
    else:
        T = int(args.num_diffusion_steps - skip.min())
        multi = len(args.target_prompt) > 1

        # every host-built array travels as a jit ARGUMENT (params,
        # conditioning, CFG tensors, the solver/schedule pytree) — closure
        # constants bloat the program and can hit slow remote-backend paths
        bundle = {
            "params": pipe.params_dict(),
            "sched": pipe.sched,
            "empty": pipe.encode_text([""], negative=True),
            "uncond": uncond,
            "src": src,
            "tgt": tgt,
            "cfg_src_t": cfg_src_t,
            "cfg_tar_t": cfg_tar_t,
            "masks": masks if multi else None,
            "tstart": jnp.asarray(tstart) if multi else None,
        }

        if stable_audio:
            # thread the 2nd-order solver history from the forward pass into
            # the reverse pass (reference extra_info, inversion_utils.py:129,219)
            @jax.jit
            def edit(b, w0, rng):
                p = pipe.bind({**b["params"], "sched": b["sched"]})
                fwd_den = p.make_denoiser(b["empty"], b["src"], b["cfg_src_t"])
                rev_den = (fwd_den if args.selfcheck else
                           p.make_denoiser(b["uncond"], b["tgt"], b["cfg_tar_t"]))
                _, zs, xts, extras = inversion_forward_process(
                    p.sched, fwd_den, w0, rng, eta=args.eta,
                    numerical_fix=args.numerical_fix, return_extras=True,
                    # selfcheck measures the numerics, so keep zs[0]: the
                    # reference's z_0 zeroing is an editing convention that
                    # injects a known final-step variance error
                    zero_first=not args.selfcheck,
                )
                out = inversion_reverse_process(
                    p.sched, rev_den, xts, zs[:T], eta=args.eta,
                    tstart=b["tstart"], fix_alpha=args.fix_alpha,
                    masks=b["masks"], init_history=extras[T - 1],
                )
                # selfcheck target is xts[0]: the solver's final step ignores
                # z (final_sigmas_type='zero'), so the exact-reconstruction
                # property lands on the recorded trajectory start
                return (out, xts[0]) if args.selfcheck else out
        else:
            @jax.jit
            def edit(b, w0, rng):
                p = pipe.bind({**b["params"], "sched": b["sched"]})
                fwd_den = p.make_denoiser(b["empty"], b["src"], b["cfg_src_t"])
                rev_den = (fwd_den if args.selfcheck else
                           p.make_denoiser(b["uncond"], b["tgt"], b["cfg_tar_t"]))
                _, zs, xts = inversion_forward_process(
                    p.sched, fwd_den, w0, rng, eta=args.eta,
                    numerical_fix=args.numerical_fix,
                    zero_first=not args.selfcheck,
                )
                out = inversion_reverse_process(
                    p.sched, rev_den, xts, zs[:T], eta=args.eta,
                    tstart=b["tstart"], fix_alpha=args.fix_alpha,
                    masks=b["masks"],
                )
                # xts[0] == w0 up to the numerical-fix re-projection here;
                # using it keeps the selfcheck target uniform across families
                return (out, xts[0]) if args.selfcheck else out

        from ..ops.flash_attention import sp_mesh_scope
        from ..utils.profiling import PhaseTimer, trace

        timer = PhaseTimer()
        n_steps = int(args.num_diffusion_steps + T)
        # sp_mesh_scope routes DiT self-attention through the shard_map
        # Pallas kernel under --sp; it must wrap the FIRST edit call (jit
        # traces there). No-op without a real sp axis.
        with trace(args.profile_dir), timer.phase("edit", steps=n_steps), \
                sp_mesh_scope(mesh):
            w_edit = jax.block_until_ready(edit(bundle, w0, rng))
        timer.report()
        if args.selfcheck:
            w_edit, recon_ref = w_edit

    # decode + vocode: ONE jitted graph (BASELINE: fused decode path),
    # params threaded as arguments
    @jax.jit
    def decode(params, w):
        p = pipe.bind(params)
        x_dec = p.vae_decode(w)
        return x_dec, p.decode_to_mel(x_dec)

    x_dec, audio = decode(pipe.params_dict(), w_edit)
    audio = np.asarray(audio)
    orig_audio = np.asarray(pipe.decode_to_mel(x0))

    selfcheck_snr = None
    if args.selfcheck:
        # Reconstruction SNR in latent space: 'ours'-mode inversion is exact
        # by construction (zs are the recorded residuals), so with the same
        # source conditioning on the reverse pass w_edit must reproduce the
        # recorded trajectory start xts[0] up to float error (>=40 dB); DDIM
        # inversion is first-order approximate and lands far lower. A
        # collapsed SNR on a real-weight run means the weights/converter/
        # schedule disagree somewhere.
        ref = np.asarray(w0 if args.mode == "ddim" else recon_ref, np.float64)
        err = np.asarray(w_edit, np.float64) - ref
        sig = float(np.mean(np.square(ref)))
        selfcheck_snr = float(10.0 * np.log10(sig / max(float(np.mean(
            np.square(err))), 1e-30)))
        verdict = ("PASS" if selfcheck_snr >= 40.0 else "WEAK"
                   ) if args.mode == "ours" else "ddim-approx"
        print(f"[selfcheck] latent reconstruction SNR: "
              f"{selfcheck_snr:.1f} dB ({verdict})")

    save_path = edit_save_path(args.results_path, args.model_id, args.init_aud,
                               args.source_prompt, args.target_prompt,
                               args.target_neg_prompt)
    os.makedirs(save_path, exist_ok=True)
    name = edit_image_name(args.mode, args.cfg_src, args.cfg_tar, skip,
                           args.num_diffusion_steps)
    if args.selfcheck:
        # keep reconstruction artifacts out of the eval regexes' way
        name = "selfcheck_" + name

    if audio.ndim == 3:  # stable-audio waveform (B, C, T)
        audio = audio[0]
    if orig_audio.ndim == 3:
        orig_audio = orig_audio[0]
    if not stable_audio:
        save_spectrogram_png(os.path.join(save_path, name + ".png"), np.asarray(x_dec))
    write_wav(os.path.join(save_path, name + ".wav"), audio, sr)
    write_wav(os.path.join(save_path, "orig.wav"), orig_audio, sr)
    dump_run_summary(save_path, args, {"seed": seed, "duration": duration,
                                       "selfcheck_snr_db": selfcheck_snr})
    print(f"[+] saved {os.path.join(save_path, name + '.wav')}")

    # wandb artifacts (reference: main_run.py:226-231 — orig/gen audio +
    # orig_spec/gen_spec images)
    from .common import log_edit_artifacts

    log_edit_artifacts(
        wandb, name, sr,
        orig_audio=np.squeeze(orig_audio).T if orig_audio.ndim > 1 else orig_audio,
        gen_audio=np.squeeze(audio).T if audio.ndim > 1 else audio,
        orig_spec=None if stable_audio else np.squeeze(np.asarray(x0)),
        gen_spec=None if stable_audio else np.squeeze(np.asarray(x_dec)),
    )
    wandb.finish()
    return os.path.join(save_path, name + ".wav")


if __name__ == "__main__":
    main()
