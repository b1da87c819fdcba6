"""Pallas blocked self-attention for the diffusion UNet/DiT hot path.

XLA's generic dot-product attention materializes the (S, S) score matrix in
HBM — at the UNet's finest level (10 s clip -> S = 4096 tokens) that is the
dominant memory traffic of the layer. This kernel tiles queries into VMEM
blocks and keeps each block's scores entirely on-chip: per grid step it
computes ``softmax(q_blk @ K^T) @ V`` with fp32 accumulation, never writing
scores to HBM. K/V for one (batch, head) pair fit comfortably in VMEM at
every shape this framework runs (S <= 4096, d <= 128 -> <= 2 MB each), so no
online-softmax streaming is needed — a deliberately simpler, faster design
than a full flash-attention carry loop.

Falls back to ``jax.nn.dot_product_attention`` for masked/cross attention
(small K — no S^2 blowup there) and on non-TPU backends (interpret mode is
used under tests).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# scores VMEM budget ~4 MB at fp32 -> bq * S <= 1M elements
_MAX_SCORE_ELEMS = 1 << 20
# measured on v5e: kernel 3.8x faster than XLA at S=4096 (2.43 vs 9.20 ms,
# B2 H8 D80 bf16) but ~1.2x slower at S=1024 where XLA's fusion wins
_MIN_SEQ_FOR_KERNEL = 2048


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # Matmul INPUTS stay in the model dtype (bf16 on the perf path — the
    # MXU runs f32xf32 at ~1/8 the bf16 rate on v5e); accumulation and the
    # softmax run in f32 (preferred_element_type), the standard recipe.
    q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)  # (bq, d)
    k = k_ref[0]  # (S, d)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, S) f32
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, d) f32
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def _block_q(seq: int, kv: int) -> int:
    bq = max(1, _MAX_SCORE_ELEMS // max(kv, 1))
    bq = min(bq, seq, 1024)
    # largest divisor of seq that is <= bq and sublane-friendly
    for cand in range(bq, 0, -1):
        if seq % cand == 0:
            return cand
    return seq


@functools.partial(jax.jit, static_argnames=("interpret",))
def _blocked_attention(q, k, v, interpret: bool = False):
    """(B, S, H, D) self-attention, scores never leave VMEM."""
    B, S, H, D = q.shape
    scale = 1.0 / (D ** 0.5)
    qt = q.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    kt = k.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    vt = v.transpose(0, 2, 1, 3).reshape(B * H, S, D)

    bq = _block_q(S, S)
    grid = (B * H, S // bq)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * S * D,
            bytes_accessed=(3 * B * H * S * D + B * H * S * D) * q.dtype.itemsize,
            transcendentals=B * H * S * S,
        ),
    )(qt, kt, vt)
    return out.reshape(B, H, S, D).transpose(0, 2, 1, 3)


def fused_attention(
    q: jnp.ndarray,  # (B, Q, H, D)
    k: jnp.ndarray,  # (B, K, H, D)
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Attention dispatcher: Pallas blocked kernel for long unmasked
    self-attention on TPU, XLA fused attention otherwise."""
    B, Q, H, D = q.shape
    K = k.shape[1]
    use_kernel = (
        bias is None
        and Q == K
        and Q >= _MIN_SEQ_FOR_KERNEL
        and Q % 8 == 0
        and D <= 256
    )
    if use_kernel:
        backend = jax.default_backend()
        if backend == "tpu":
            return _blocked_attention(q, k, v, interpret=False)
        # exercised under tests via the interpreter so the kernel logic is
        # covered on CPU too
        import os

        if os.environ.get("PALLAS_INTERPRET_ATTENTION", "0") == "1":
            return _blocked_attention(q, k, v, interpret=True)
    return jax.nn.dot_product_attention(q, k, v, bias=bias)
