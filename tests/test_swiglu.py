"""Fused SwiGLU Pallas kernel tests (interpret mode on CPU)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audioeditingcode_tpu.ops.swiglu import (
    _block_sizes,
    _reference,
    _swiglu_call,
    fused_swiglu,
)


def _rand(rng, m, e, n, dtype=jnp.float32):
    ks = jax.random.split(rng, 3)
    x = jax.random.normal(ks[0], (m, e), dtype)
    kernel = jax.random.normal(ks[1], (e, 2 * n), dtype) / np.sqrt(e)
    bias = jax.random.normal(ks[2], (2 * n,), jnp.float32) * 0.1
    return x, kernel, bias


class TestSwiGLUKernel:
    @pytest.mark.parametrize("m,e,n", [(512, 128, 256), (520, 256, 512),
                                       (2066, 128, 384)])
    def test_matches_reference(self, m, e, n):
        # 2066 = the flagship folded rows (batch-2 CFG x 1033-token DiT
        # sequence); 520 exercises the %8 row padding
        x, kernel, bias = _rand(jax.random.PRNGKey(0), m, e, n)
        ref = _reference(x, kernel, bias.astype(jnp.float32))
        got = _swiglu_call(x, kernel, bias, interpret=True)
        assert got.shape == (m, n)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_bf16_inputs_f32_epilogue(self):
        x, kernel, bias = _rand(jax.random.PRNGKey(1), 512, 128, 256,
                                jnp.bfloat16)
        ref = _reference(x.astype(jnp.float32), kernel.astype(jnp.float32),
                         bias)
        got = _swiglu_call(x, kernel, bias, interpret=True)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref), atol=3e-2, rtol=3e-2)

    def test_block_sizes_fit_and_divide(self):
        for m, e, n in [(2072, 1536, 6144), (520, 128, 256), (8, 128, 128),
                        (65536, 1536, 6144)]:
            bm, bn = _block_sizes(m, e, n, 2)
            assert m % bm == 0 and n % bn == 0
            assert bm % 8 == 0 or bm == m
            # one grid step's working set stays under scoped VMEM
            working = (bm * e * 2 + 2 * bm * bn * 4 + bm * bn * 2
                       + 2 * e * bn * 2)
            assert working <= (14 << 20), (m, e, n, bm, bn, working)

    def test_flagship_shape_single_row_tile(self):
        # at the flagship DiT shape the x block must stay resident across
        # the whole hidden sweep (weights then stream exactly once)
        bm, bn = _block_sizes(2072, 1536, 6144, 2)
        assert bm == 2072, bm


class TestDispatcher:
    def test_kernel_path_on_cpu_interpret(self):
        os.environ["PALLAS_INTERPRET_SWIGLU"] = "1"
        try:
            x, kernel, bias = _rand(jax.random.PRNGKey(2), 2048, 128, 256)
            x3 = x.reshape(2, 1024, 128)  # rows counted across batch dims
            ref = _reference(x3, kernel, bias.astype(jnp.float32))
            got = fused_swiglu(x3, kernel, bias)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-5, rtol=2e-5)
        finally:
            del os.environ["PALLAS_INTERPRET_SWIGLU"]

    def test_small_and_unaligned_fall_back(self):
        # tiny test models (E=64) and small row counts: XLA path, exact
        x, kernel, bias = _rand(jax.random.PRNGKey(3), 16, 64, 128)
        ref = _reference(x, kernel, bias.astype(x.dtype))
        got = fused_swiglu(x, kernel, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=0, rtol=0)

    def test_vmapped_folds_into_rows(self):
        # long-form windows vmap the DiT: the custom_vmap rule must fold the
        # window axis into kernel rows, not prepend it to every block
        os.environ["PALLAS_INTERPRET_SWIGLU"] = "1"
        try:
            x, kernel, bias = _rand(jax.random.PRNGKey(4), 512, 128, 256)
            xw = jnp.stack([x, x * 0.5, -x])  # (3, 512, 128)
            got = jax.vmap(lambda xi: fused_swiglu(xi, kernel, bias))(xw)
            ref = jnp.stack([
                _reference(xw[i], kernel, bias.astype(jnp.float32))
                for i in range(3)])
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-5, rtol=2e-5)
        finally:
            del os.environ["PALLAS_INTERPRET_SWIGLU"]

    def test_env_kill_switch(self):
        os.environ["PALLAS_INTERPRET_SWIGLU"] = "1"
        os.environ["AEC_FUSED_SWIGLU"] = "0"
        try:
            x, kernel, bias = _rand(jax.random.PRNGKey(5), 1024, 128, 256)
            ref = _reference(x, kernel, bias.astype(x.dtype))
            got = fused_swiglu(x, kernel, bias)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=0, rtol=0)
        finally:
            del os.environ["AEC_FUSED_SWIGLU"]
            del os.environ["PALLAS_INTERPRET_SWIGLU"]


def test_dit_ff_param_tree_unchanged():
    """_SwiGLUProj must declare exactly nn.Dense(2N)'s param layout so
    existing converted checkpoints load unchanged."""
    from audioeditingcode_tpu.models.dit1d import SwiGLUFeedForward

    ff = SwiGLUFeedForward(dim=64)
    params = ff.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 64)))["params"]
    assert set(params) == {"net_0_proj", "net_2"}
    assert set(params["net_0_proj"]) == {"kernel", "bias"}
    assert params["net_0_proj"]["kernel"].shape == (64, 512)
    assert params["net_0_proj"]["bias"].shape == (512,)
    assert params["net_2"]["kernel"].shape == (256, 64)
