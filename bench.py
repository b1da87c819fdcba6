#!/usr/bin/env python
"""Benchmark: U-Net denoiser steps/sec/chip on the flagship edit workload.

Measures the hot kernel of the whole system (SURVEY.md §6: one "ours"-mode
edit = 600 UNet forwards): the CFG-fused UNet denoise step on an
AudioLDM-s-shaped latent for a 10 s clip (latent (1, 8, 256, 16)), batch 2
(cond+uncond fused — the reference issues them as two separate calls).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
baseline is the BASELINE.json north star of >=40 UNet steps/sec/chip.

Env overrides: BENCH_MODEL (default cvssp/audioldm2-music — the reference
CLIs' default model; cvssp/audioldm-s-full-v2 also measured in PERF_NOTES),
BENCH_DTYPE (bfloat16|float32, default bfloat16), BENCH_STEPS (default 200).
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from audioeditingcode_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    from audioeditingcode_tpu.models.registry import load_model
    from audioeditingcode_tpu.editing.cfg import build_cfg_tensors
    from audioeditingcode_tpu.editing.invert import (
        inversion_forward_process,
        inversion_reverse_process,
    )

    model_id = os.environ.get("BENCH_MODEL", "cvssp/audioldm2-music")
    dtype_s = os.environ.get("BENCH_DTYPE", "bfloat16")
    steps = int(os.environ.get("BENCH_STEPS", "200"))
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
        "tgt": pipe.encode_text(["a jazzy saxophone solo"]),
        "cfg_t": build_cfg_tensors(spec_shape, ["a jazzy saxophone solo"], [12.0])[0],
        "sched": pipe.sched,
    }

    @jax.jit
    def edit(bundle, w0, rng):
        # bind the traced schedule too, so the denoiser's timestep lookups
        # come from the argument pytree rather than a host constant
        p = pipe.bind({**bundle["params"], "sched": bundle["sched"]})
        denoise = p.make_denoiser(bundle["uncond"], bundle["tgt"], bundle["cfg_t"])
        _, zs, xts = inversion_forward_process(p.sched, denoise, w0, rng)
        return inversion_reverse_process(p.sched, denoise, xts, zs[:tstart])

    rng = jax.random.PRNGKey(1)
    # warmup/compile (np.asarray forces a real device->host read: on the
    # axon remote backend block_until_ready alone can return before the
    # execution has actually run)
    np.asarray(edit(bundle, w0, rng))

    n_rep = 3
    t0 = time.perf_counter()
    for i in range(n_rep):
        out = np.asarray(edit(bundle, w0, jax.random.fold_in(rng, i)))
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()
    dt = (time.perf_counter() - t0) / n_rep

    # one edit = steps (forward) + tstart (reverse) denoiser steps
    unet_steps = steps + tstart
    steps_per_sec = unet_steps / dt
    n_chips = jax.device_count()
    per_chip = steps_per_sec / n_chips

    baseline = 40.0  # BASELINE.json north star: >=40 UNet steps/sec/chip
    print(json.dumps({
        "metric": "unet_steps_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "steps/s/chip",
        "vs_baseline": round(per_chip / baseline, 3),
        "detail": {
            "model": model_id,
            "dtype": dtype_s,
            "edit_wallclock_s": round(dt, 3),
            "unet_steps_per_edit": unet_steps,
            "chips": n_chips,
            "latent": list(spec_shape),
        },
    }))


if __name__ == "__main__":
    main()
