"""Fused SwiGLU projection (Pallas) for the DiT feed-forward hot path.

The Stable Audio DiT feed-forward (reference drives it through diffusers
``FeedForward(activation_fn="swiglu")``; see models.py:1331-1354) is
``net_2(h * silu(gate))`` with ``[h | gate] = x @ W0 + b0`` — 58G of the
88.7G FLOPs per DiT layer (PERF_NOTES.md). Unfused, XLA writes the
(M, 8E) ``net_0`` output to HBM, reads both halves back for the swiglu
elementwise fusion and writes the (M, 4E) product again — ~150 MB of HBM
traffic per layer at the flagship batch-2 CFG shape, ~4 ms/step across 24
layers at v5e bandwidth, pure overhead against the roofline.

This kernel computes ``(x @ Wa + ba) * silu(x @ Wb + bb)`` in one pass:

- the ``net_0_proj`` kernel/bias are passed TWICE with different block
  index maps (value half / gate half), so the two logical weight matrices
  are zero-copy views of the checkpoint parameter;
- x (all rows, folded batch) stays resident in VMEM across the hidden-tile
  sweep — weights are streamed once, the (M, 8E) intermediate never exists;
- matmuls take model-dtype (bf16) inputs on the MXU with f32 accumulation;
  the silu epilogue runs in f32 and casts once on the way out.

``net_2`` stays a plain XLA matmul: its input is the kernel's output and
XLA already fuses the residual add into it.

Falls back to the reference XLA expression off-TPU (interpret mode covers
the kernel logic under tests) and for lane-unaligned tiny-model shapes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Kernel pays off when the (M, 8E) intermediate it eliminates is large;
# below this row count XLA's fusion is competitive and compile time isn't
# worth it (tiny test models, single-token shapes).
_MIN_ROWS_FOR_KERNEL = 512
# scoped-VMEM ceiling for one grid step's working set (hard limit ~16 MB)
_VMEM_BUDGET = 13 << 20


def _kernel(x_ref, wa_ref, wb_ref, ba_ref, bb_ref, o_ref):
    x = x_ref[...]  # (bm, E) model dtype
    a = jax.lax.dot_general(
        x, wa_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + ba_ref[0]  # (bm, bn) f32
    g = jax.lax.dot_general(
        x, wb_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bb_ref[0]
    o_ref[...] = (a * (g * jax.nn.sigmoid(g))).astype(o_ref.dtype)


def _block_sizes(m: int, e: int, n: int, itemsize: int):
    """(bm, bn) such that x block + two f32 (bm, bn) temps + weight tiles +
    out block fit the VMEM budget. Prefers a single m tile (weights then
    stream exactly once)."""
    bn = 256 if n % 256 == 0 else 128
    # per-step cost(bm) = x (bm*e*itemsize) + 2 matmul accum f32 (bm*bn*4)
    # + out (bm*bn*itemsize) + 2 weight tiles (e*bn*itemsize) + biases
    fixed = 2 * e * bn * itemsize + 2 * bn * 4
    per_row = e * itemsize + 2 * bn * 4 + bn * itemsize
    bm = max(8, (_VMEM_BUDGET - fixed) // per_row)
    if bm >= m:
        return m, bn
    bm -= bm % 8
    # largest divisor of m that is <= bm and a sublane multiple (m is %8)
    for cand in range(bm, 7, -8):
        if m % cand == 0:
            return cand, bn
    return 8, bn


@functools.partial(jax.jit, static_argnames=("interpret",))
def _swiglu_call(x2d, kernel, bias, interpret: bool = False):
    m0, e = x2d.shape
    n = kernel.shape[1] // 2
    m = -(-m0 // 8) * 8
    if m != m0:
        x2d = jnp.pad(x2d, ((0, m - m0), (0, 0)))
    bias2d = bias.reshape(1, -1)
    bm, bn = _block_sizes(m, e, n, x2d.dtype.itemsize)
    grid = (m // bm, n // bn)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), x2d.dtype),
        grid=grid,
        in_specs=[
            # x block constant across the inner n sweep -> stays resident
            pl.BlockSpec((bm, e), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            # the SAME checkpoint kernel twice: value half / gate half
            pl.BlockSpec((e, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((e, bn), lambda i, j, nb=n // bn: (0, nb + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, nb=n // bn: (0, nb + j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * m * e * n,
            bytes_accessed=(m * e + 2 * e * n + m * n) * x2d.dtype.itemsize,
            transcendentals=m * n,
        ),
    )(x2d, kernel, kernel, bias2d, bias2d)
    return out[:m0] if m != m0 else out


def _reference(x, kernel, bias):
    h = jnp.dot(x, kernel) + bias.astype(x.dtype)
    h, gate = jnp.split(h, 2, axis=-1)
    return h * jax.nn.silu(gate)


@functools.lru_cache(maxsize=2)
def _vmappable(interpret: bool):
    """custom_vmap wrapper: fold vmap axes (long-form windows, batched
    clips) into the kernel's row dimension instead of letting the default
    pallas batching rule prepend them to every block (VMEM blowup)."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def swiglu(x2d, kernel, bias):
        return _swiglu_call(x2d, kernel, bias, interpret=interpret)

    @swiglu.def_vmap
    def _rule(axis_size, in_batched, x2d, kernel, bias):  # noqa: ANN001
        if in_batched[1] or in_batched[2]:
            # per-batch weights (never happens in this framework): folding
            # would broadcast-copy them — just compute unfused
            ref = jax.vmap(_reference,
                           in_axes=tuple(0 if b else None
                                         for b in in_batched))
            return ref(x2d, kernel, bias), True
        folded = _swiglu_call(x2d.reshape(-1, x2d.shape[-1]), kernel, bias,
                              interpret=interpret)
        return folded.reshape(axis_size, -1, folded.shape[-1]), True

    return swiglu


def fused_swiglu(x: jnp.ndarray, kernel: jnp.ndarray,
                 bias: jnp.ndarray) -> jnp.ndarray:
    """``(x @ k[:, :N] + b[:N]) * silu(x @ k[:, N:] + b[N:])``.

    x: (..., E); kernel: (E, 2N) — the diffusers ``net_0_proj`` layout
    (value half then gate half, models.py FeedForward swiglu); bias: (2N,).
    Dispatches to the fused Pallas kernel on TPU when shapes are
    lane-aligned and large enough to matter; XLA expression otherwise.
    """
    e = x.shape[-1]
    n2 = kernel.shape[1]
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    eligible = (
        e % 128 == 0
        and (n2 // 2) % 128 == 0
        and n2 % 2 == 0
        and rows >= _MIN_ROWS_FOR_KERNEL
        and os.environ.get("AEC_FUSED_SWIGLU", "1") == "1"
    )
    if eligible:
        backend = jax.default_backend()
        interpret = (backend != "tpu" and os.environ.get(
            "PALLAS_INTERPRET_SWIGLU", "0") == "1")
        if backend == "tpu" or interpret:
            x2d = x.reshape(-1, e)
            out = _vmappable(interpret)(x2d, kernel, bias)
            return out.reshape(x.shape[:-1] + (n2 // 2,))
    return _reference(x, kernel, bias)
