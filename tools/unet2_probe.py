#!/usr/bin/env python
"""Ablation probes for the AudioLDM2 CFG-fused UNet step.

HISTORICAL PREMISE, SINCE RESOLVED: this probe was written when
AudioLDM2-music appeared to measure ~26.5 ms/step vs AudioLDM-s's ~14.7
with only 1.17x the FLOPs (479 vs 410 GFLOP by XLA cost analysis) — a
supposed dual-stream efficiency deficit. That reading came from a
degraded tunnel session; the verified number is ~14.6 ms/step and the
dual-stream layout is slightly MORE efficient than AudioLDM-s
(PERF_NOTES.md "Measurement trust"). The probe's component table remains
valid and is recorded in PERF_NOTES.md "AudioLDM2 ablation probe".

Each variant here deletes one component of the real model and times the
real CFG-fused denoiser step inside a lax.scan (materialized per rep — the
only trustworthy timing through the axon tunnel, PERF_NOTES.md): if
deleting a component saves X ms/step, no optimization of it can save more
than X.

Variants:
  baseline       the shipping dual-stream UNet forward
  single_stream  only the per-position stream-0 transformer (GPT-2 K=8 ctx)
  stream1_only   only the per-position stream-1 transformer (T5 K ctx)
  no_cross       both streams keep self-attn + FF, skip cross-attn
  no_self        both streams keep cross-attn + FF, skip self-attn
  no_ff          both streams keep attention, skip the GEGLU FF
  xla_attn       Pallas self-attention kernel disabled (XLA everywhere)

Program-bisect variants (the model untouched; the PROGRAM around the
denoiser varies — kept for localizing any future raw-step vs in-edit
discrepancy; the round-3 "edit program costs 26.5 vs 15 ms raw" gap that
motivated them was the degraded-session artifact above, and the verified
edit program runs at the raw-step cost):
  fwd_only       inversion_forward_process alone (200 steps)
  rev_only       inversion_reverse_process alone on synthetic xts/zs (100)
  edit           the full bench-identical two-scan edit program (300)

Each variant runs in a FRESH subprocess (fast-init memoization and the
Pallas dispatch constants are process-global, and the axon tunnel prefers
short-lived processes). Run on the real TPU:

  python tools/unet2_probe.py [--steps 50] [--reps 3] [--variants ...]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

MODEL = os.environ.get("UNET2_PROBE_MODEL", "cvssp/audioldm2-music")
LATENT_TIME = int(os.environ.get("UNET2_PROBE_LATENT_TIME", "256"))
VARIANTS = ["baseline", "single_stream", "stream1_only", "no_cross",
            "no_self", "no_ff", "xla_attn"]


def apply_variant(variant: str) -> None:
    """Patch the model classes BEFORE load_model traces anything."""
    from typing import Optional

    import flax.linen as nn
    import jax.numpy as jnp

    from audioeditingcode_tpu.models import attention, registry, unet2d
    from audioeditingcode_tpu.ops import flash_attention

    if variant in ("baseline", "fwd_only", "rev_only", "edit"):
        return  # program-bisect variants leave the model untouched
    if variant == "xla_attn":
        flash_attention._MIN_SEQ_FOR_KERNEL = 1 << 30
        return

    if variant in ("no_cross", "no_self", "no_ff"):

        class AblatedBlock(nn.Module):
            # BasicTransformerBlock with one sublayer deleted
            dim: int
            heads: int
            head_dim: int
            cross_attention_dim: Optional[int] = None
            dtype: jnp.dtype = jnp.float32

            @nn.compact
            def __call__(self, x, context=None, context_bias=None):
                A = attention.Attention
                if variant != "no_self":
                    h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
                    x = x + A(self.dim, self.heads, self.head_dim,
                              dtype=self.dtype, name="attn1")(h)
                if variant != "no_cross":
                    h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
                    x = x + A(self.dim, self.heads, self.head_dim,
                              cross_attention_dim=self.cross_attention_dim,
                              dtype=self.dtype, name="attn2")(
                        h, context=context,
                        attention_bias=(context_bias if context is not None
                                        else None))
                if variant != "no_ff":
                    h = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
                    x = x + attention.GEGLUFeedForward(
                        self.dim, dtype=self.dtype, name="ff")(h)
                return x

        attention.BasicTransformerBlock = AblatedBlock
        return

    if variant in ("single_stream", "stream1_only"):

        class AblatedUNet(unet2d.UNet2DConditionModel):
            def _attn_layer(self, channels, heads, prefix, j, sample, hs,
                            ctx_bias, hs1, ctx1_bias):
                cfg = self.config
                if variant == "single_stream":
                    return self._attn(
                        channels, heads, f"{prefix}_{2 * j}",
                        cfg.cross_attention_dim)(sample, hs, ctx_bias)
                return self._attn(
                    channels, heads, f"{prefix}_{2 * j + 1}",
                    cfg.cross_attention_dim_1)(sample, hs1, ctx1_bias)

        unet2d.UNet2DConditionModel = AblatedUNet
        registry.UNet2DConditionModel = AblatedUNet
        return

    raise SystemExit(f"unknown variant {variant!r}")


def time_variant(variant: str, steps: int, reps: int) -> float:
    import jax
    import jax.numpy as jnp

    from audioeditingcode_tpu.utils.jax_setup import enable_compilation_cache

    if os.environ.get("AEC_PLATFORM"):  # CPU smoke of the probe itself
        jax.config.update("jax_platforms", os.environ["AEC_PLATFORM"])
    enable_compilation_cache()
    apply_variant(variant)

    from audioeditingcode_tpu.editing.cfg import build_cfg_tensors
    from audioeditingcode_tpu.models.registry import load_model

    pipe = load_model(MODEL, 200, dtype=jnp.bfloat16, latent_time=LATENT_TIME)
    spec_shape = (1, pipe.unet.config.in_channels, LATENT_TIME,
                  64 // pipe.vae_pad_multiple)
    bundle = {
        "params": pipe.params_dict(),
        "uncond": pipe.encode_text([""]),
        "tgt": pipe.encode_text(["a jazzy saxophone solo"]),
        "cfg_t": build_cfg_tensors(spec_shape, ["x"], [12.0])[0],
        "sched": pipe.sched,
    }
    x0 = jax.random.normal(jax.random.PRNGKey(0), spec_shape, jnp.float32)

    if variant in ("fwd_only", "rev_only", "edit"):
        from audioeditingcode_tpu.editing.invert import (
            inversion_forward_process,
            inversion_reverse_process,
        )

        S = int(os.environ.get("UNET2_PROBE_S", "200"))
        tstart = S // 2

        if variant == "fwd_only":
            steps = S

            @jax.jit
            def run(bundle, x0, rng):
                p = pipe.bind({**bundle["params"], "sched": bundle["sched"]})
                den = p.make_denoiser(bundle["uncond"], bundle["tgt"],
                                      bundle["cfg_t"])
                x, _, _ = inversion_forward_process(p.sched, den, x0, rng)
                return x
        elif variant == "rev_only":
            steps = tstart
            xts0 = jax.random.normal(
                jax.random.PRNGKey(1), (S + 1,) + spec_shape, jnp.float32)
            zs0 = jax.random.normal(
                jax.random.PRNGKey(2), (tstart,) + spec_shape, jnp.float32)

            @jax.jit
            def run(bundle, xts, zs):
                p = pipe.bind({**bundle["params"], "sched": bundle["sched"]})
                den = p.make_denoiser(bundle["uncond"], bundle["tgt"],
                                      bundle["cfg_t"])
                return inversion_reverse_process(p.sched, den, xts, zs)
        else:  # edit — the bench_mel program verbatim
            steps = S + tstart

            @jax.jit
            def run(bundle, x0, rng):
                p = pipe.bind({**bundle["params"], "sched": bundle["sched"]})
                den = p.make_denoiser(bundle["uncond"], bundle["tgt"],
                                      bundle["cfg_t"])
                _, zs, xts = inversion_forward_process(p.sched, den, x0, rng)
                return inversion_reverse_process(p.sched, den, xts,
                                                 zs[:tstart])

        args = ((bundle, xts0, zs0) if variant == "rev_only"
                else (bundle, x0, jax.random.PRNGKey(3)))
        np.asarray(run(*args))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            out = np.asarray(run(*args))
        dt = (time.perf_counter() - t0) / reps / steps
        # synthetic rev_only inputs may be non-physical; skip finite check
        if variant != "rev_only":
            assert np.isfinite(out.astype(np.float32)).all()
        return dt * 1e3

    @jax.jit
    def run(bundle, x0):
        p = pipe.bind({**bundle["params"], "sched": bundle["sched"]})
        den = p.make_denoiser(bundle["uncond"], bundle["tgt"], bundle["cfg_t"])

        def step(h, k):
            # fold eps into the carry so no step can be DCE'd
            return h - 1e-3 * den(h, k), ()

        out, _ = jax.lax.scan(step, x0, jnp.arange(steps))
        return out

    np.asarray(run(bundle, x0))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = np.asarray(run(bundle, x0))
    dt = (time.perf_counter() - t0) / reps / steps
    assert np.isfinite(out.astype(np.float32)).all()
    return dt * 1e3  # ms/step


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--variants", nargs="*", default=VARIANTS)
    args = p.parse_args(argv)

    child = os.environ.get("UNET2_PROBE_CHILD")
    if child:
        ms = time_variant(child, args.steps, args.reps)
        print(f"RESULT {child} {ms:.2f}", flush=True)
        return

    base = None
    for v in args.variants:
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--steps", str(args.steps), "--reps", str(args.reps)],
            env=dict(os.environ, UNET2_PROBE_CHILD=v),
            stdout=subprocess.PIPE, text=True, timeout=1800)
        ms = None
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT "):
                ms = float(line.split()[2])
        if ms is None:
            print(f"{v:14s} FAILED rc={proc.returncode}", flush=True)
            continue
        if v == "baseline":
            base = ms
        delta = (f"  (saves {base - ms:+.2f} ms)"
                 if base is not None and v != "baseline" else "")
        print(f"{v:14s} {ms:7.2f} ms/step{delta}  "
              f"[{time.time() - t0:.0f}s incl. compile]", flush=True)


if __name__ == "__main__":
    main()
