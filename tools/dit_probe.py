#!/usr/bin/env python
"""Per-candidate ceiling probes for the Stable Audio DiT step (VERDICT r2 #6).

The worst-case batch-2 CFG DiT step sits at ~70% MFU (PERF_NOTES.md). The
remaining fusion candidates (LayerNorm fusion, rotary-in-kernel, fused
SwiGLU) each have an UPPER BOUND measurable by ablation: if deleting a
component entirely saves X ms/step, no fusion of it can save more than X.
This probe times the real 24-layer DiT inside a lax.scan (the only
trustworthy timing through the axon tunnel — materialized per rep) under
each ablation and prints a table for PERF_NOTES.md.

Variants:
  baseline      the shipping DiT forward
  no_rotary     skip the partial rotary application on q/k
  no_ln         skip all three LayerNorms per block
  no_softmax    attention with scores used linearly (no exp/max/sum)
  no_cross      skip the cross-attention sublayer entirely
  no_ff         skip the SwiGLU FF entirely
  ff_only       FF sublayer only (residual chain kept)

Run on the real TPU:  python tools/dit_probe.py [--steps 200] [--reps 5]
(baseline runs first AND last to bracket tunnel-session drift)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def build_variant_forward(variant: str):
    """A 24-layer DiT-block stack forward with the given ablation, matching
    dit1d.DiTBlock's math (self-attn + cross-attn + SwiGLU, pre-LN)."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from audioeditingcode_tpu.models.dit1d import (
        DiT1DConfig,
        GQAttention,
        SwiGLUFeedForward,
        rotary_tables,
    )
    from audioeditingcode_tpu.ops.flash_attention import (
        _host_rotary,
        fused_attention,
    )

    cfg = DiT1DConfig()  # real stable-audio-open geometry

    class AblatedAttention(nn.Module):
        heads: int
        kv_heads: int
        head_dim: int
        dtype: jnp.dtype = jnp.bfloat16

        @nn.compact
        def __call__(self, x, context=None, rotary=None):
            B, S, _ = x.shape
            ctx = x if context is None else context
            inner = self.heads * self.head_dim
            kv_inner = self.kv_heads * self.head_dim
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
            k = nn.Dense(kv_inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
            v = nn.Dense(kv_inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
            q = q.reshape(B, S, self.heads, self.head_dim)
            k = k.reshape(B, ctx.shape[1], self.kv_heads, self.head_dim)
            v = v.reshape(B, ctx.shape[1], self.kv_heads, self.head_dim)
            if rotary is not None and variant != "no_rotary":
                cos, sin = rotary
                q = _host_rotary(q, cos, sin)
                k = _host_rotary(k, cos, sin)
            if variant == "no_softmax" and context is None:
                # linear "attention": same matmul FLOPs, zero transcendentals
                kr = jnp.repeat(k, self.heads // self.kv_heads, axis=2)
                vr = jnp.repeat(v, self.heads // self.kv_heads, axis=2)
                s = jnp.einsum("bqhd,bkhd->bhqk", q, kr,
                               preferred_element_type=jnp.float32)
                out = jnp.einsum("bhqk,bkhd->bqhd", s.astype(vr.dtype) /
                                 s.shape[-1], vr)
            else:
                out = fused_attention(q, k, v)
            out = out.reshape(B, S, inner)
            return nn.Dense(inner, use_bias=False, dtype=self.dtype,
                            name="to_out_0")(out)

    class AblatedBlock(nn.Module):
        dtype: jnp.dtype = jnp.bfloat16

        @nn.compact
        def __call__(self, x, ctx, rotary):
            def ln(name, h):
                if variant == "no_ln":
                    return h
                return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=name)(h)

            if variant != "ff_only":
                h = ln("norm1", x)
                x = x + AblatedAttention(cfg.num_attention_heads,
                                         cfg.num_key_value_attention_heads,
                                         cfg.attention_head_dim,
                                         dtype=self.dtype, name="attn1")(
                    h, rotary=rotary)
                if variant != "no_cross":
                    h = ln("norm2", x)
                    x = x + AblatedAttention(cfg.num_attention_heads,
                                             cfg.num_key_value_attention_heads,
                                             cfg.attention_head_dim,
                                             dtype=self.dtype, name="attn2")(
                        h, context=ctx)
            if variant not in ("no_ff",):
                h = ln("norm3", x)
                x = x + SwiGLUFeedForward(dim=cfg.inner_dim, dtype=self.dtype,
                                          name="ff")(h)
            return x

    class Stack(nn.Module):
        dtype: jnp.dtype = jnp.bfloat16

        @nn.compact
        def __call__(self, x, ctx, rotary):
            for i in range(cfg.num_layers):
                x = AblatedBlock(dtype=self.dtype, name=f"b{i}")(x, ctx, rotary)
            return x

    B, S = 2, 1025  # worst-case CFG batch, latent 1024 + global token
    module = Stack()
    x = jax.random.normal(jax.random.PRNGKey(0), (B, S, cfg.inner_dim),
                          jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (B, 130, cfg.cross_attention_dim), jnp.bfloat16)
    rot = rotary_tables(cfg.rotary_embed_dim, S)
    params = module.init(jax.random.PRNGKey(2), x, ctx, rot)
    # Store params in bf16 like the shipping pipeline does: Flax init
    # returns f32 (param_dtype default), and leaving them f32 makes every
    # scan step cast the full parameter set f32->bf16 — measured ~3
    # ms/step of pure cast/HBM traffic that the real model never pays.
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)
    return module, params, (x, ctx, rot)


def time_variant(variant: str, steps: int, reps: int) -> list:
    import jax
    import jax.numpy as jnp

    module, params, (x, ctx, rot) = build_variant_forward(variant)

    @jax.jit
    def run(params, x):
        def step(h, _):
            return module.apply(params, h, ctx, rot), ()

        out, _ = jax.lax.scan(step, x, None, length=steps)
        return out

    np.asarray(run(params, x))  # compile + warm
    np.asarray(run(params, x))  # absorb the slow first post-compile exec
    rep_ms = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = np.asarray(run(params, x))
        rep_ms.append((time.perf_counter() - t0) / steps * 1e3)
    # no_softmax (unbounded linear scores) and no_ln (24 unnormalized
    # residual adds at random init) overflow to inf by construction; the
    # arithmetic executed is identical, so the timing stays valid.
    assert (np.isfinite(out.astype(np.float32)).all()
            or variant in ("no_softmax", "no_ln"))
    return rep_ms


VARIANTS = ["baseline", "no_rotary", "no_ln", "no_softmax", "no_cross",
            "no_ff", "ff_only"]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=200,
                   help="scan length per rep; longer scans push the "
                        "per-dispatch tunnel RTT below the noise floor")
    p.add_argument("--reps", type=int, default=5)
    # baseline runs FIRST and LAST so session drift over the sweep is
    # visible in the output (tunnel sessions drift by several ms/step —
    # two 50-step/3-rep sweeps disagreed by up to 6 ms on single variants)
    p.add_argument("--variants", nargs="*",
                   default=VARIANTS + ["baseline"])
    args = p.parse_args(argv)

    from audioeditingcode_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    base = None
    for i, v in enumerate(args.variants):
        rep_ms = time_variant(v, args.steps, args.reps)
        med = float(np.median(rep_ms))
        if v == "baseline" and base is None:
            base = med
        delta = (f"  (saves {base - med:+.2f} ms)"
                 if base is not None and (v != "baseline" or i > 0) else "")
        reps_s = "/".join(f"{m:.2f}" for m in rep_ms)
        print(f"{v:12s} {med:7.2f} ms/step  min {min(rep_ms):6.2f}  "
              f"reps [{reps_s}]{delta}", flush=True)


if __name__ == "__main__":
    main()
