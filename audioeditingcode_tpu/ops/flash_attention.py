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

import contextlib
import contextvars
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# scores VMEM budget ~4 MB at fp32 -> bq * S <= 1M elements
_MAX_SCORE_ELEMS = 1 << 20
# in-model on v5e the kernel is worth ~2.2x on the attention share at
# S=4096 (UNet level-0) and ~1.3x on the whole DiT step at S=1025 (24
# layers x 24 heads of f32 scores stay off HBM); at S<1024 XLA's fusion
# is competitive (see PERF_NOTES.md)
_MIN_SEQ_FOR_KERNEL = 1024
# scoped-VMEM ceiling for the full K/V blocks (Mosaic pads the head dim to
# 128 lanes, so small-D shapes cost 128/D more than their logical size;
# the hard limit is 16 MB for the whole kernel stack)
_MAX_KV_VMEM_BYTES = 8 << 20


def _kv_vmem_bytes(seq: int, head_dim: int, itemsize: int) -> int:
    lanes = ((head_dim + 127) // 128) * 128
    return 2 * seq * lanes * itemsize


def _rotate(x, cos, sin):
    """Partial rotary on the first cos.shape[-1] features of (rows, D) x,
    in f32, rotate-half convention (matches models/dit1d._apply_partial_rotary)."""
    rot = cos.shape[-1]
    xr = x[:, :rot].astype(jnp.float32)
    half = rot // 2
    rh = jnp.concatenate([-xr[:, half:], xr[:, :half]], axis=-1)
    out = xr * cos + rh * sin
    return jnp.concatenate([out.astype(x.dtype), x[:, rot:]], axis=-1)


def _attn_rotary_kernel(q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                        o_ref, *, scale: float, kv_len: int):
    """_attn_kernel with the partial rotary embedding applied INSIDE the
    kernel: rotated q/k never round-trip through HBM and the pre-attention
    elementwise fusion boundary disappears. cq/sq are the (bq, rot) table
    rows for this query block; ck/sk the full (S, rot) tables for k (the
    same arrays passed twice with different index maps)."""
    q = _rotate(q_ref[0], cq_ref[...], sq_ref[...])
    q = (q.astype(jnp.float32) * scale).astype(q_ref.dtype)
    k = _rotate(k_ref[0], ck_ref[...], sk_ref[...])
    _attn_core(q, k, v_ref[0], o_ref, kv_len=kv_len)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int):
    # Matmul INPUTS stay in the model dtype (bf16 on the perf path — the
    # MXU runs f32xf32 at ~1/8 the bf16 rate on v5e); accumulation and the
    # softmax run in f32 (preferred_element_type), the standard recipe.
    q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)  # (bq, d)
    _attn_core(q, k_ref[0], v_ref[0], o_ref, kv_len=kv_len)


def _attn_core(q, k, v, o_ref, *, kv_len: int):
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, S) f32
    if kv_len < s.shape[-1]:
        # seq was padded to a sublane multiple (e.g. the DiT's S=1025 with
        # its prepended global token): mask padded key columns out of the
        # softmax; padded query rows produce garbage sliced off by the host
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, jnp.float32(-1e30))
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, d) f32
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def _block_q(seq_q: int, kv_bytes: int, seq_kv: Optional[int] = None) -> int:
    # two f32 (bq, S_kv) temporaries (scores + probs) must fit beside the
    # full lane-padded K/V blocks inside the 16 MB scoped-VMEM ceiling
    seq_kv = seq_q if seq_kv is None else seq_kv
    budget = max((12 << 20) - kv_bytes, 1 << 20)
    bq = max(1, min(budget // (8 * seq_kv), _MAX_SCORE_ELEMS // seq_kv))
    bq = min(bq, seq_q, 1024)
    if bq >= seq_q:
        return seq_q
    # largest divisor of seq_q that is <= bq AND a sublane multiple — Mosaic
    # requires block sizes divisible by 8 unless equal to the full dim
    # (callers pad seq_q to %8, so bq=8 always qualifies)
    for cand in range(bq - bq % 8, 7, -8):
        if seq_q % cand == 0:
            return cand
    return seq_q


@functools.lru_cache(maxsize=2)
def _batched_blocked_attention(interpret: bool):
    """custom_vmap wrapper: fold any vmap axis into the kernel's B*H grid
    axis. The default pallas batching rule prepends the vmap dim to every
    BLOCK, multiplying VMEM use by the batch size — at long-form window
    counts that exceeds scoped VMEM and fails to compile."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def attn(q, k, v):
        return _blocked_attention(q, k, v, interpret=interpret)

    @attn.def_vmap
    def _rule(axis_size, in_batched, q, k, v):  # noqa: ANN001
        def fold(x, batched):
            if not batched:
                x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            return x.reshape((-1,) + x.shape[2:])

        out = _blocked_attention(fold(q, in_batched[0]), fold(k, in_batched[1]),
                                 fold(v, in_batched[2]), interpret=interpret)
        return out.reshape((axis_size, -1) + out.shape[1:]), True

    return attn


@functools.lru_cache(maxsize=2)
def _batched_rotary_attention(interpret: bool):
    """As _batched_blocked_attention but with the rotary tables: cos/sin
    are position-indexed (shared across the vmap axis), so only q/k/v fold
    into the grid axis."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def attn(q, k, v, cos, sin):
        return _blocked_attention(q, k, v, rotary=(cos, sin),
                                  interpret=interpret)

    @attn.def_vmap
    def _rule(axis_size, in_batched, q, k, v, cos, sin):  # noqa: ANN001
        def fold(x, batched):
            if not batched:
                x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            return x.reshape((-1,) + x.shape[2:])

        if in_batched[3] or in_batched[4]:
            # per-batch rotary tables never occur here (tables depend only
            # on position); keep the rule total anyway
            out = jax.vmap(
                lambda qi, ki, vi, ci, si: _blocked_attention(
                    _host_rotary(qi, ci, si), _host_rotary(ki, ci, si), vi,
                    interpret=interpret),
                in_axes=tuple(0 if b else None for b in in_batched),
            )(q, k, v, cos, sin)
            return out, True
        out = _blocked_attention(
            fold(q, in_batched[0]), fold(k, in_batched[1]),
            fold(v, in_batched[2]), rotary=(cos, sin), interpret=interpret)
        return out.reshape((axis_size, -1) + out.shape[1:]), True

    return attn


def _small_kv_attention(q, k, v, bias=None):
    """Cross-attention for tiny key counts (K far below the 128-lane tile).

    XLA's generic attention materializes (B, H, Q, K) scores with K minor:
    on TPU the minor dim is padded to 128 lanes, so at K=8 (AudioLDM2's
    generated-embeds stream) every score op — masking, softmax, the PV
    matmul — runs at ~6% lane utilization. Transposing the layout to
    (B, H, K, Q) keeps Q lane-major and reduces over the K sublanes
    instead, so the softmax runs at full lane width and K pads only to one
    8-sublane tile.

    Measured NEUTRAL in-model on v5e (AudioLDM2-music batch-2 CFG edit:
    37.71 vs 37.79 steps/s/chip, 2026-08-19 A/B — XLA's fusion already
    hides the tiny-K relayouts behind the surrounding matmuls), so the
    dispatcher default is OFF; kept behind AEC_SMALL_KV_ATTN=1 for
    re-measurement on future shapes. Matches ``jax.nn.dot_product_attention``
    math (f32 softmax/logit scaling, additive bias) with matmul inputs kept
    in the model dtype for the MXU; the 1/sqrt(D) scale is applied to the
    f32 logits AFTER the QK^T einsum, so no extra low-precision rounding is
    introduced on q.
    """
    D = q.shape[-1]
    scale = 1.0 / (D ** 0.5)
    # (B, H, K, Q): Q minor/lane-major
    s = jnp.einsum("bkhd,bqhd->bhkq", k, q,
                   preferred_element_type=jnp.float32) * scale
    if bias is not None:
        # additive (..., Q, K) bias (typically (B, 1, 1, K) from
        # mask_to_bias) -> (..., K, Q)
        s = s + jnp.swapaxes(bias.astype(jnp.float32), -1, -2)
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=2, keepdims=True)
    out = jnp.einsum("bhkq,bkhd->bqhd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _host_rotary(x, cos, sin):
    """(B, S, H, D) partial rotary outside the kernel (fallback paths)."""
    rot = cos.shape[-1]
    xr = x[..., :rot].astype(jnp.float32)
    half = rot // 2
    rh = jnp.concatenate([-xr[..., half:], xr[..., :half]], axis=-1)
    out = xr * cos[:, None] + rh * sin[:, None]
    return jnp.concatenate([out.astype(x.dtype), x[..., rot:]], axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret", "kv_len"))
def _blocked_attention(q, k, v, rotary=None, interpret: bool = False,
                       kv_len: Optional[int] = None):
    """(B, Sq, H, D) x (B, Skv, H_kv, D) attention, scores never leave VMEM.

    ``kv_len`` overrides the number of REAL keys when the caller already
    padded the key axis (the sp wrapper pads the global sequence to a
    shard multiple before gathering K/V); defaults to k.shape[1].

    Square (Sq == Skv) for single-chip self-attention; rectangular when the
    sequence-parallel wrapper (``_sp_blocked_attention``) hands each shard
    its local query block against the sp-gathered full K/V. Sequences that
    are not a sublane multiple (e.g. the DiT's 1024+1 global token) are
    zero-padded to %8; padded key columns are masked inside the kernel and
    padded query rows sliced off here.

    Grouped-query attention: k/v may carry fewer heads than q (H_kv | H) —
    the grid index map points each query head at its kv group, so shared
    K/V is never materialized H/H_kv times in HBM."""
    B, Sq0, H, D = q.shape
    Sk_arr = k.shape[1]           # keys present in the array
    Sk0 = kv_len if kv_len is not None else Sk_arr  # keys that are REAL
    H_kv = k.shape[2]
    rep = H // H_kv
    Sq = -(-Sq0 // 8) * 8
    Sk = -(-Sk_arr // 8) * 8
    if Sq != Sq0:
        q = jnp.pad(q, ((0, 0), (0, Sq - Sq0), (0, 0), (0, 0)))
    if Sk != Sk_arr:
        pad = ((0, 0), (0, Sk - Sk_arr), (0, 0), (0, 0))
        k, v = jnp.pad(k, pad), jnp.pad(v, pad)
    scale = 1.0 / (D ** 0.5)
    qt = q.transpose(0, 2, 1, 3).reshape(B * H, Sq, D)
    kt = k.transpose(0, 2, 1, 3).reshape(B * H_kv, Sk, D)
    vt = v.transpose(0, 2, 1, 3).reshape(B * H_kv, Sk, D)

    def kv_index(i, j):
        return ((i // H) * H_kv + (i % H) // rep, 0, 0)

    bq = _block_q(Sq, _kv_vmem_bytes(Sk, D, q.dtype.itemsize), Sk)
    grid = (B * H, Sq // bq)
    in_specs = [
        pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Sk, D), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Sk, D), kv_index, memory_space=pltpu.VMEM),
    ]
    operands = [qt, kt, vt]
    if rotary is None:
        kernel = functools.partial(_attn_kernel, scale=scale, kv_len=Sk0)
    else:
        # in-kernel rotary tables index q rows by GLOBAL position — only
        # meaningful on the square single-chip path (the sp wrapper applies
        # rotary on the host before sharding)
        assert Sq0 == Sk0, "in-kernel rotary requires square self-attention"
        cos, sin = rotary
        rot = cos.shape[-1]
        if cos.shape[0] != Sk:
            rpad = ((0, Sk - cos.shape[0]), (0, 0))
            cos, sin = jnp.pad(cos, rpad), jnp.pad(sin, rpad)
        kernel = functools.partial(_attn_rotary_kernel, scale=scale,
                                   kv_len=Sk0)
        # the SAME cos/sin arrays twice: query-block rows and full-k rows
        in_specs += [
            pl.BlockSpec((bq, rot), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, rot), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Sk, rot), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Sk, rot), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [cos, sin, cos, sin]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sq * Sk * D,
            bytes_accessed=(B * H * Sq * D + 2 * B * H_kv * Sk * D
                            + B * H * Sq * D) * q.dtype.itemsize,
            transcendentals=B * H * Sq * Sk,
        ),
    )(*operands)
    out = out.reshape(B, H, Sq, D).transpose(0, 2, 1, 3)
    return out[:, :Sq0] if Sq != Sq0 else out


_SP_MESH_SCOPE = contextvars.ContextVar("aec_sp_mesh", default=None)
_WARNED_NO_LEGACY_MESH = False


def sp_mesh_scope(mesh):
    """Context manager routing sp-sharded self-attention through the
    shard_map Pallas kernel.

    The --sp CLIs (cli/run.py, run_batch.py) enter this scope around their
    jitted edit call so the dispatcher sees the sp mesh at TRACE time —
    no reliance on an ambient ``with mesh:`` context, which the CLIs never
    establish (they shard via device_put(NamedSharding) only). A mesh of
    None or one without a real 'sp' axis is a no-op, so callers wrap
    unconditionally. Caveat: jax.jit caches by abstract signature only —
    a program traced inside the scope keeps the sp kernel on later calls
    outside it (and vice versa); trace sp and non-sp programs from
    distinct jit functions, as the CLIs do (one process per config)."""

    @contextlib.contextmanager
    def _scope():
        tok = _SP_MESH_SCOPE.set(mesh)
        try:
            yield
        finally:
            _SP_MESH_SCOPE.reset(tok)

    return _scope()


def _validated_sp_mesh(m):
    """A mesh routes attention through the sp shard_map iff it carries an
    'sp' axis. Size 1 counts: make_mesh only creates the axis when sp is
    explicitly requested, and routing at sp=1 is how the shard_map +
    in-shard Pallas lowering is rehearsed on a single real chip
    (VERDICT r4 #5) — the gather over a 1-member axis is the identity."""
    if m is None or getattr(m, "empty", False) or "sp" not in m.axis_names:
        return None
    return m


def _ambient_sp_mesh():
    """The sp Mesh the dispatcher should shard_map over, else None.

    Sources, in order: the explicit ``sp_mesh_scope`` the CLIs enter
    (primary — the CLIs trace their jitted edits OUTSIDE any mesh
    context), then the legacy ``with mesh:`` context for direct callers.
    The legacy lookup uses a deprecated accessor; if a future jax removes
    it, the explicit scope still works and a one-time warning records the
    lost fallback instead of silently disabling sp routing."""
    m = _validated_sp_mesh(_SP_MESH_SCOPE.get())
    if m is not None:
        return m
    try:
        from jax.interpreters import pxla

        phys = pxla.thread_resources.env.physical_mesh
    except (ImportError, AttributeError):  # pragma: no cover — future jax
        global _WARNED_NO_LEGACY_MESH
        if not _WARNED_NO_LEGACY_MESH:
            _WARNED_NO_LEGACY_MESH = True
            import warnings

            warnings.warn(
                "jax removed the legacy mesh-context accessor; `with mesh:`"
                " no longer routes sp attention — use"
                " flash_attention.sp_mesh_scope(mesh)")
        return None
    return _validated_sp_mesh(phys)


def _sp_blocked_attention(q, k, v, mesh, interpret: bool = False):
    """Sequence-parallel Pallas attention: shard_map over the 'sp' axis.

    Each shard runs the blocked kernel on its LOCAL query rows against the
    sp-gathered full K/V (the gather is ~1.5 MB bf16 per DiT layer — rides
    ICI, parallel/mesh.py). This keeps the kernel's measured win under
    --sp instead of silently reverting to XLA attention (the round-3
    caveat). The global sequence is padded to a (8 * sp) multiple so every
    shard's block is a sublane multiple; padded keys are masked inside the
    kernel via kv_len and padded query rows sliced off here. Axes other
    than 'sp' are unmentioned in the specs, i.e. replicated — the
    supported sp layout (batch replicated per sp group; dp shards clips at
    a higher level)."""
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map  # modern spelling (jax >= 0.8)
        rep_kw = {"check_vma": False}
    except ImportError:  # pragma: no cover — older jax
        from jax.experimental.shard_map import shard_map
        rep_kw = {"check_rep": False}

    B, S0, H, D = q.shape
    sp = mesh.shape["sp"]
    S = -(-S0 // (8 * sp)) * (8 * sp)
    if S != S0:
        pad = ((0, 0), (0, S - S0), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    spec = P(None, "sp", None, None)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, **rep_kw)
    def body(ql, kl, vl):
        kf = jax.lax.all_gather(kl, "sp", axis=1, tiled=True)
        vf = jax.lax.all_gather(vl, "sp", axis=1, tiled=True)
        return _blocked_attention(ql, kf, vf, interpret=interpret,
                                  kv_len=S0)

    out = body(q, k, v)
    return out[:, :S0] if S != S0 else out


def _chunked_attention(q, k, v, chunk: int = 512):
    """Memory-bounded dense attention: queries processed in chunks via a
    sequential ``lax.map`` so the (chunk, S) score slab replaces the full
    (S, S) matrix in HBM. Fallback for very long sequences where the
    Pallas kernel's full K/V VMEM blocks do not fit (small head dims pad
    to 128 lanes) and XLA's dense path would materialize S^2 scores."""
    B, S, H, D = q.shape
    scale = 1.0 / (D ** 0.5)
    qt = (q * scale).transpose(0, 2, 1, 3)  # (B, H, S, D)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    c = min(chunk, S)
    while S % c:
        c //= 2
    qb = qt.reshape(B, H, S // c, c, D).transpose(2, 0, 1, 3, 4)

    def blk(qc):  # (B, H, c, D)
        s = jnp.einsum("bhqd,bhkd->bhqk", qc.astype(jnp.float32),
                       kt.astype(jnp.float32))
        m = s.max(-1, keepdims=True)
        p = jnp.exp(s - m)
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(vt.dtype), vt)
        return (o / p.sum(-1, keepdims=True)).astype(q.dtype)

    ob = jax.lax.map(blk, qb)  # (S/c, B, H, c, D)
    return ob.transpose(1, 2, 0, 3, 4).reshape(B, H, S, D).transpose(0, 2, 1, 3)


def fused_attention(
    q: jnp.ndarray,  # (B, Q, H, D)
    k: jnp.ndarray,  # (B, K, H, D)
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    rotary: Optional[tuple] = None,  # (cos, sin), each (Q, rot_dim)
) -> jnp.ndarray:
    """Attention dispatcher: Pallas blocked kernel for long unmasked
    self-attention on TPU, XLA fused attention otherwise. When ``rotary``
    is given, the partial rotary embedding is applied to q/k before the
    kernel; AEC_ROTARY_IN_KERNEL=1 opts into applying it INSIDE the kernel
    instead (measured slower on v5e — see PERF_NOTES.md)."""
    import os

    B, Q, H, D = q.shape
    K = k.shape[1]
    use_kernel = (
        bias is None
        and Q == K
        and Q >= _MIN_SEQ_FOR_KERNEL
        and D <= 256
        and H % k.shape[2] == 0
        and _kv_vmem_bytes(-(-Q // 8) * 8, D, q.dtype.itemsize)
        <= _MAX_KV_VMEM_BYTES
    )
    # Default OFF: the in-kernel rotate was measured SLOWER in-model on v5e
    # (Stable Audio batch-2 CFG edit: 31.36 vs 32.29 steps/s/chip with the
    # host rotate, 2026-08-18 A/B, PERF_NOTES.md) — the per-block (cos, sin)
    # table reloads cost more than the ~19 MB/layer HBM round-trip they
    # save. Kept behind AEC_ROTARY_IN_KERNEL=1 for future re-measurement.
    rotary_in_kernel = (
        rotary is not None
        and rotary[0].shape[-1] % 2 == 0
        and os.environ.get("AEC_ROTARY_IN_KERNEL", "0") == "1"
    )
    if use_kernel:
        backend = jax.default_backend()
        interpret = (backend != "tpu" and os.environ.get(
            "PALLAS_INTERPRET_ATTENTION", "0") == "1")
        if backend == "tpu" or interpret:
            # exercised under tests via the interpreter so the kernel
            # logic is covered on CPU too
            sp_mesh = _ambient_sp_mesh()
            if sp_mesh is not None:
                # sequence-parallel: shard_map over 'sp' — each shard's
                # query block attends to the sp-gathered full K/V, so the
                # kernel win is kept under --sp (rotary applied on the
                # host first: the in-kernel tables index global positions)
                if rotary is not None:
                    q = _host_rotary(q, *rotary)
                    k = _host_rotary(k, *rotary)
                return _sp_blocked_attention(q, k, v, sp_mesh,
                                             interpret=interpret)
            if rotary_in_kernel:
                return _batched_rotary_attention(interpret)(
                    q, k, v, rotary[0], rotary[1])
            if rotary is not None:
                q = _host_rotary(q, *rotary)
                k = _host_rotary(k, *rotary)
            return _batched_blocked_attention(interpret)(q, k, v)
    if rotary is not None:
        q = _host_rotary(q, *rotary)
        k = _host_rotary(k, *rotary)
    if (K <= 64 and K < Q and H == k.shape[2]
            and os.environ.get("AEC_SMALL_KV_ATTN", "0") == "1"):
        # tiny-K cross attention, transposed score layout: measured NEUTRAL
        # in-model (PERF_NOTES.md 2026-08-19 A/B), default off
        return _small_kv_attention(q, k, v, bias)
    if bias is None and Q == K and Q >= 8192 and H == k.shape[2]:
        # kernel-ineligible long self-attention: dense XLA would put the
        # full (S, S) score matrix in HBM (24 GB at S=16k batch 24)
        return _chunked_attention(q, k, v)
    return jax.nn.dot_product_attention(q, k, v, bias=bias)
