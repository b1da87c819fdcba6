#!/usr/bin/env python
"""Benchmark: denoiser steps/sec/chip on the flagship edit workload, for
EVERY model family (the whole PERF_NOTES.md headline table).

Measures the hot kernel of the whole system (SURVEY.md §6: one "ours"-mode
edit = 600 UNet forwards): the CFG-fused denoiser step inside the real
two-scan edit program. Mel families run the 10 s clip latent (1, 8, 256, 16)
at 200+100 steps; Stable Audio runs its fixed (1, 64, 1024) stereo latent at
100+50 steps (reference CLI defaults, code/main_run.py:41-43).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "detail"}:
the headline value is the reference CLIs' default model
(cvssp/audioldm2-music); detail.families carries one entry per family so
the driver artifact records the full table.

Env overrides:
  BENCH_MODELS  comma list of model ids, or "all" (default: all 5 families)
  BENCH_MODEL   legacy single-model override (implies BENCH_MODELS=<it>)
  BENCH_DTYPE   bfloat16|float32 (default bfloat16)
  BENCH_STEPS   mel-family diffusion steps (default 200)
  BENCH_SA_STEPS stable-audio diffusion steps (default 100)
"""

import json
import os
import sys
import time

import numpy as np

FAMILIES = [
    "cvssp/audioldm-s-full-v2",
    "cvssp/audioldm-l-full",
    "cvssp/audioldm2-music",
    "declare-lab/tango-full-ft-audiocaps",
    "stabilityai/stable-audio-open-1.0",
]
HEADLINE = "cvssp/audioldm2-music"
BASELINE = 40.0  # BASELINE.json north star: >=40 UNet steps/sec/chip
N_REP = 3
PROMPT = "a jazzy saxophone solo"


def _timed_reps(edit, bundle, w0):
    """Compile + N_REP timed executions; np.asarray per rep forces a real
    device->host read (axon block_until_ready can return early)."""
    import jax

    rng = jax.random.PRNGKey(1)
    np.asarray(edit(bundle, w0, rng))  # warmup/compile
    t0 = time.perf_counter()
    for i in range(N_REP):
        out = np.asarray(edit(bundle, w0, jax.random.fold_in(rng, i)))
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()
    return (time.perf_counter() - t0) / N_REP


def bench_mel(model_id: str, steps: int, dtype_s: str) -> dict:
    """UNet-family edit: inversion (steps) + reverse (steps//2)."""
    import jax
    import jax.numpy as jnp

    from audioeditingcode_tpu.models.registry import load_model
    from audioeditingcode_tpu.editing.cfg import build_cfg_tensors
    from audioeditingcode_tpu.editing.invert import (
        inversion_forward_process,
        inversion_reverse_process,
    )

    dtype = jnp.bfloat16 if dtype_s == "bfloat16" else jnp.float32
    # 10 s clip at 16 kHz: 1024 mel frames -> latent (1, 8, 256, 16)
    latent_time = int(os.environ.get("BENCH_LATENT_TIME", "256"))
    pipe = load_model(model_id, steps, dtype=dtype, latent_time=latent_time)
    spec_shape = (1, pipe.unet.config.in_channels, latent_time,
                  64 // pipe.vae_pad_multiple)
    w0 = jax.random.normal(jax.random.PRNGKey(0), spec_shape, dtype=jnp.float32)
    tstart = steps // 2

    # EVERYTHING host-built travels as jit ARGUMENTS — params, conditioning,
    # CFG tensors and the schedule pytree. Closure-captured arrays become
    # program constants, which blow up the compile payload and can hit slow
    # per-execution paths on remote-compile backends.
    bundle = {
        "params": pipe.params_dict(),
        "uncond": pipe.encode_text([""]),
        "tgt": pipe.encode_text([PROMPT]),
        "cfg_t": build_cfg_tensors(spec_shape, [PROMPT], [12.0])[0],
        "sched": pipe.sched,
    }

    @jax.jit
    def edit(bundle, w0, rng):
        p = pipe.bind({**bundle["params"], "sched": bundle["sched"]})
        denoise = p.make_denoiser(bundle["uncond"], bundle["tgt"], bundle["cfg_t"])
        _, zs, xts = inversion_forward_process(p.sched, denoise, w0, rng)
        return inversion_reverse_process(p.sched, denoise, xts, zs[:tstart])

    dt = _timed_reps(edit, bundle, w0)
    return _row(model_id, dtype_s, steps + tstart, dt, list(spec_shape))


def bench_stable_audio(model_id: str, steps: int, dtype_s: str,
                       empty_src: bool = False) -> dict:
    """DiT edit with 2nd-order solver history threading (100+50 steps).

    empty_src=True benches the editing-typical CLI config (no source
    prompt): the inversion's CFG term is exactly zero for an empty prompt
    (eps_"" == eps_uncond), so the forward pass runs batch-1 uncond — an
    exact-math optimization the CLI applies (run.py src=None path) and the
    reference never exploits (it always runs both CFG streams,
    inversion_utils.py:95-102). The default row keeps the worst-case
    batch-2 CFG forward for comparability."""
    import jax
    import jax.numpy as jnp

    from audioeditingcode_tpu.models.registry import load_model
    from audioeditingcode_tpu.editing.invert import (
        inversion_forward_process,
        inversion_reverse_process,
    )

    dtype = jnp.bfloat16 if dtype_s == "bfloat16" else jnp.float32
    pipe = load_model(model_id, steps, dtype=dtype)
    shape = (1, pipe.dit.config.in_channels, pipe.sample_size)
    w0 = jax.random.normal(jax.random.PRNGKey(0), shape, dtype=jnp.float32)
    tstart = steps // 2

    bundle = {
        "params": pipe.params_dict(),
        "uncond": pipe.encode_text([""], negative=True),
        "tgt": pipe.encode_text([PROMPT]),
        "cfg_t": jnp.full((1,) + shape[1:], 12.0),
    }

    @jax.jit
    def edit(bundle, w0, rng):
        p = pipe.bind(bundle["params"])
        fwd_den = (p.make_denoiser(bundle["uncond"], None, None) if empty_src
                   else p.make_denoiser(bundle["uncond"], bundle["tgt"],
                                        bundle["cfg_t"]))
        rev_den = p.make_denoiser(bundle["uncond"], bundle["tgt"], bundle["cfg_t"])
        _, zs, xts, extras = inversion_forward_process(
            p.sched, fwd_den, w0, rng, return_extras=True)
        return inversion_reverse_process(
            p.sched, rev_den, xts, zs[:tstart], init_history=extras[tstart - 1])

    dt = _timed_reps(edit, bundle, w0)
    row = _row(model_id, dtype_s, steps + tstart, dt, list(shape))
    if empty_src:
        row["config"] = "empty_src_batch1_fwd"
    return row


def _row(model_id, dtype_s, unet_steps, dt, latent) -> dict:
    import jax

    n_chips = jax.device_count()
    per_chip = unet_steps / dt / n_chips
    return {
        "model": model_id,
        "steps_per_sec_per_chip": round(per_chip, 2),
        "vs_baseline": round(per_chip / BASELINE, 3),
        "dtype": dtype_s,
        "edit_wallclock_s": round(dt, 3),
        "unet_steps_per_edit": unet_steps,
        "chips": n_chips,
        "latent": latent,
    }


def main():
    from audioeditingcode_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    dtype_s = os.environ.get("BENCH_DTYPE", "bfloat16")
    steps = int(os.environ.get("BENCH_STEPS", "200"))
    sa_steps = int(os.environ.get("BENCH_SA_STEPS", "100"))

    models_env = os.environ.get("BENCH_MODEL") or os.environ.get(
        "BENCH_MODELS", "all")
    models = FAMILIES if models_env == "all" else [
        m.strip() for m in models_env.split(",") if m.strip()]

    rows = []
    for model_id in models:
        t0 = time.perf_counter()
        if "stable-audio" in model_id:
            row = bench_stable_audio(model_id, sa_steps, dtype_s)
        else:
            row = bench_mel(model_id, steps, dtype_s)
        print(f"[bench] {model_id}: {row['steps_per_sec_per_chip']} steps/s/chip "
              f"({time.perf_counter() - t0:.0f}s incl. load/compile)",
              file=sys.stderr)
        rows.append(row)
        if "stable-audio" in model_id:
            # editing-typical config: empty source prompt -> exact batch-1
            # uncond inversion (see bench_stable_audio docstring)
            t0 = time.perf_counter()
            row = bench_stable_audio(model_id, sa_steps, dtype_s, empty_src=True)
            print(f"[bench] {model_id} (empty src): "
                  f"{row['steps_per_sec_per_chip']} steps/s/chip "
                  f"({time.perf_counter() - t0:.0f}s incl. compile)",
                  file=sys.stderr)
            rows.append(row)

    head = next((r for r in rows if r["model"] == HEADLINE), rows[0])
    print(json.dumps({
        "metric": "unet_steps_per_sec_per_chip",
        "value": head["steps_per_sec_per_chip"],
        "unit": "steps/s/chip",
        "vs_baseline": head["vs_baseline"],
        "detail": {
            "model": head["model"],
            "dtype": head["dtype"],
            "edit_wallclock_s": head["edit_wallclock_s"],
            "unet_steps_per_edit": head["unet_steps_per_edit"],
            "chips": head["chips"],
            "latent": head["latent"],
            "families": rows,
        },
    }))


if __name__ == "__main__":
    main()
