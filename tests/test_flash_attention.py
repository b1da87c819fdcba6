"""Pallas blocked-attention kernel tests (interpret mode on CPU)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audioeditingcode_tpu.ops.flash_attention import (
    _block_q,
    _blocked_attention,
    fused_attention,
)


class TestBlockedAttention:
    @pytest.mark.parametrize("S,D,H", [(512, 64, 2), (768, 32, 3), (1024, 16, 1)])
    def test_matches_xla_attention(self, S, D, H):
        rngs = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(rngs[0], (2, S, H, D))
        k = jax.random.normal(rngs[1], (2, S, H, D))
        v = jax.random.normal(rngs[2], (2, S, H, D))
        ref = jax.nn.dot_product_attention(q, k, v)
        got = _blocked_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_bf16(self):
        rngs = jax.random.split(jax.random.PRNGKey(1), 3)
        q = jax.random.normal(rngs[0], (1, 512, 2, 64), jnp.bfloat16)
        k = jax.random.normal(rngs[1], (1, 512, 2, 64), jnp.bfloat16)
        v = jax.random.normal(rngs[2], (1, 512, 2, 64), jnp.bfloat16)
        ref = jax.nn.dot_product_attention(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
        got = _blocked_attention(q, k, v, interpret=True)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                                   atol=3e-2, rtol=3e-2)

    @pytest.mark.parametrize("S", [1025, 1027])
    def test_unaligned_seq_padded_and_masked(self, S):
        # the DiT's 1024+1 global-token sequence: kernel pads to %8 and
        # masks the padded key columns out of the softmax
        rngs = jax.random.split(jax.random.PRNGKey(2), 3)
        q = jax.random.normal(rngs[0], (2, S, 3, 64))
        k = jax.random.normal(rngs[1], (2, S, 3, 64))
        v = jax.random.normal(rngs[2], (2, S, 3, 64))
        ref = jax.nn.dot_product_attention(q, k, v)
        got = _blocked_attention(q, k, v, interpret=True)
        assert got.shape == q.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_dispatcher_uses_kernel_at_1025(self):
        # S=1025 >= the 1024 threshold -> kernel path (interpret on CPU)
        os.environ["PALLAS_INTERPRET_ATTENTION"] = "1"
        try:
            q = jax.random.normal(jax.random.PRNGKey(3), (1, 1025, 2, 64))
            ref = jax.nn.dot_product_attention(q, q, q)
            got = fused_attention(q, q, q)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-5, rtol=2e-5)
        finally:
            del os.environ["PALLAS_INTERPRET_ATTENTION"]

    def test_block_q_divides(self):
        for seq in (512, 768, 4096, 520):
            bq = _block_q(seq, seq)
            assert seq % bq == 0
            assert bq * seq <= (1 << 20) or bq == 1

    def test_block_q_sublane_multiple(self):
        # Mosaic requires block sizes %8 (or == the full dim); S=1032 is the
        # DiT's padded 1024+1 sequence whose halves are NOT 8-divisible
        for seq in (1032, 1048, 2056, 4096):
            bq = _block_q(seq, 2 * seq * 128 * 2)
            assert seq % bq == 0
            assert bq % 8 == 0 or bq == seq, (seq, bq)

    def test_dispatcher_fallback_paths(self):
        # masked / cross attention -> XLA path, shapes must still work
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 512, 2, 16))
        kv = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 2, 16))
        out = fused_attention(q, kv, kv)
        assert out.shape == q.shape

    def test_dispatcher_kernel_path_on_cpu_interpret(self):
        os.environ["PALLAS_INTERPRET_ATTENTION"] = "1"
        try:
            q = jax.random.normal(jax.random.PRNGKey(0), (1, 2048, 2, 16))
            ref = jax.nn.dot_product_attention(q, q, q)
            got = fused_attention(q, q, q)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-5, rtol=2e-5)
        finally:
            del os.environ["PALLAS_INTERPRET_ATTENTION"]


def test_vmapped_kernel_folds_into_batch_axis():
    """vmap over the kernel must fold into the B*H grid axis (the default
    pallas batching rule multiplies VMEM blocks by the vmap size, which
    OOMs scoped VMEM on real windows — the long-form edit path)."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from audioeditingcode_tpu.ops.flash_attention import fused_attention

    os.environ["PALLAS_INTERPRET_ATTENTION"] = "1"
    try:
        rng = jax.random.PRNGKey(0)
        qkv = jax.random.normal(rng, (3, 3, 2, 2048, 2, 8))  # (qkv, N, B,S,H,D)
        q, k, v = qkv[0], qkv[1], qkv[2]

        batched = jax.vmap(fused_attention)(q, k, v)
        ref = jnp.stack([fused_attention(q[i], k[i], v[i]) for i in range(3)])
        np.testing.assert_allclose(np.asarray(batched), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
    finally:
        os.environ.pop("PALLAS_INTERPRET_ATTENTION", None)


def test_chunked_attention_matches_dense():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audioeditingcode_tpu.ops.flash_attention import _chunked_attention

    rng = jax.random.PRNGKey(1)
    q, k, v = jax.random.normal(rng, (3, 2, 1024, 2, 8))
    ref = jax.nn.dot_product_attention(q, k, v)
    out = _chunked_attention(q, k, v, chunk=256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gqa_kv_group_indexing():
    """k/v with fewer heads than q: the kernel's kv-group index map must
    match an explicit head-repeat reference (the DiT's 24q/12kv layout)."""
    rngs = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(rngs[0], (2, 1025, 4, 64))
    k = jax.random.normal(rngs[1], (2, 1025, 2, 64))
    v = jax.random.normal(rngs[2], (2, 1025, 2, 64))
    ref = jax.nn.dot_product_attention(
        q, jnp.repeat(k, 2, axis=2), jnp.repeat(v, 2, axis=2))
    got = _blocked_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


class TestRotaryInKernel:
    """Partial rotary applied inside the Pallas kernel must match the
    host-side rotation + plain kernel (the DiT attn1 path)."""

    @staticmethod
    def _tables(S, rot):
        from audioeditingcode_tpu.models.dit1d import rotary_tables
        return rotary_tables(rot * 2, S)  # rotary_tables(dim) -> (S, dim)

    @pytest.mark.parametrize("S,H,Hkv", [(1025, 4, 2), (1032, 2, 2)])
    def test_matches_host_rotary(self, S, H, Hkv):
        from audioeditingcode_tpu.ops.flash_attention import _host_rotary

        rngs = jax.random.split(jax.random.PRNGKey(7), 3)
        q = jax.random.normal(rngs[0], (2, S, H, 64))
        k = jax.random.normal(rngs[1], (2, S, Hkv, 64))
        v = jax.random.normal(rngs[2], (2, S, Hkv, 64))
        cos, sin = self._tables(S, 16)
        ref = _blocked_attention(_host_rotary(q, cos, sin),
                                 _host_rotary(k, cos, sin), v,
                                 interpret=True)
        got = _blocked_attention(q, k, v, rotary=(cos, sin), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_dispatcher_rotary_kernel_and_fallback_agree(self):
        os.environ["PALLAS_INTERPRET_ATTENTION"] = "1"
        try:
            rngs = jax.random.split(jax.random.PRNGKey(8), 3)
            q = jax.random.normal(rngs[0], (1, 1025, 2, 64))
            k = jax.random.normal(rngs[1], (1, 1025, 2, 64))
            v = jax.random.normal(rngs[2], (1, 1025, 2, 64))
            cos, sin = self._tables(1025, 16)
            os.environ["AEC_ROTARY_IN_KERNEL"] = "1"
            got = fused_attention(q, k, v, rotary=(cos, sin))
            os.environ["AEC_ROTARY_IN_KERNEL"] = "0"
            ref = fused_attention(q, k, v, rotary=(cos, sin))
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-5, rtol=2e-5)
        finally:
            os.environ.pop("AEC_ROTARY_IN_KERNEL", None)
            del os.environ["PALLAS_INTERPRET_ATTENTION"]

    def test_xla_fallback_applies_rotary(self):
        # short sequence -> XLA path; rotary must still be applied
        from audioeditingcode_tpu.ops.flash_attention import _host_rotary

        rngs = jax.random.split(jax.random.PRNGKey(9), 3)
        q = jax.random.normal(rngs[0], (1, 64, 2, 32))
        k = jax.random.normal(rngs[1], (1, 64, 2, 32))
        v = jax.random.normal(rngs[2], (1, 64, 2, 32))
        cos, sin = self._tables(64, 8)
        ref = jax.nn.dot_product_attention(
            _host_rotary(q, cos, sin), _host_rotary(k, cos, sin), v)
        got = fused_attention(q, k, v, rotary=(cos, sin))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_vmapped_rotary_kernel_folds(self):
        os.environ["PALLAS_INTERPRET_ATTENTION"] = "1"
        try:
            rngs = jax.random.split(jax.random.PRNGKey(10), 3)
            q = jax.random.normal(rngs[0], (3, 1, 1032, 2, 16))
            k = jax.random.normal(rngs[1], (3, 1, 1032, 2, 16))
            v = jax.random.normal(rngs[2], (3, 1, 1032, 2, 16))
            cos, sin = self._tables(1032, 4)
            f = lambda qi, ki, vi: fused_attention(  # noqa: E731
                qi, ki, vi, rotary=(cos, sin))
            got = jax.vmap(f)(q, k, v)
            ref = jnp.stack([f(q[i], k[i], v[i]) for i in range(3)])
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-5, rtol=2e-5)
        finally:
            del os.environ["PALLAS_INTERPRET_ATTENTION"]


class TestSmallKvCrossAttention:
    """Transposed-layout cross attention for tiny key counts (K << 128):
    exact parity with jax.nn.dot_product_attention."""

    def _qkv(self, B=2, Q=256, K=8, H=4, D=16, seed=11):
        rngs = jax.random.split(jax.random.PRNGKey(seed), 3)
        q = jax.random.normal(rngs[0], (B, Q, H, D))
        k = jax.random.normal(rngs[1], (B, K, H, D))
        v = jax.random.normal(rngs[2], (B, K, H, D))
        return q, k, v

    def test_parity_no_bias(self):
        from audioeditingcode_tpu.ops.flash_attention import _small_kv_attention

        q, k, v = self._qkv()
        ref = jax.nn.dot_product_attention(q, k, v)
        got = _small_kv_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_parity_with_mask_bias(self):
        from audioeditingcode_tpu.models.attention import mask_to_bias
        from audioeditingcode_tpu.ops.flash_attention import _small_kv_attention

        q, k, v = self._qkv(K=8)
        mask = jnp.asarray([[1, 1, 1, 0, 0, 0, 0, 0], [1] * 8], jnp.float32)
        bias = mask_to_bias(mask, jnp.float32)
        ref = jax.nn.dot_product_attention(q, k, v, bias=bias)
        got = _small_kv_attention(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_dispatcher_routes_small_k(self):
        """fused_attention output is identical whether the small-K path is
        enabled via AEC_SMALL_KV_ATTN=1 or left at the default (off —
        measured neutral in-model, PERF_NOTES.md)."""
        q, k, v = self._qkv(K=4, seed=12)
        ref = fused_attention(q, k, v)
        prior = os.environ.get("AEC_SMALL_KV_ATTN")
        os.environ["AEC_SMALL_KV_ATTN"] = "1"
        try:
            got = fused_attention(q, k, v)
        finally:
            # restore rather than delete: the suite may be launched with the
            # var preset (the documented re-measurement workflow)
            if prior is None:
                del os.environ["AEC_SMALL_KV_ATTN"]
            else:
                os.environ["AEC_SMALL_KV_ATTN"] = prior
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_single_key_degenerates_to_value(self):
        # K=1: softmax over one key -> output == v broadcast over queries
        from audioeditingcode_tpu.ops.flash_attention import _small_kv_attention

        q, k, v = self._qkv(K=1, seed=13)
        got = _small_kv_attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(got), np.broadcast_to(np.asarray(v), got.shape),
            atol=2e-5, rtol=2e-5)

    def test_bf16_inputs(self):
        from audioeditingcode_tpu.ops.flash_attention import _small_kv_attention

        q, k, v = (x.astype(jnp.bfloat16) for x in self._qkv(seed=14))
        ref = jax.nn.dot_product_attention(q, k, v)
        got = _small_kv_attention(q, k, v)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2)
