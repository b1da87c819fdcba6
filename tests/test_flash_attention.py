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

    def test_block_q_divides(self):
        for seq in (512, 768, 4096, 520):
            bq = _block_q(seq, seq)
            assert seq % bq == 0
            assert bq * seq <= (1 << 20) or bq == 1

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
