"""Attention / transformer blocks for the diffusion UNets (Flax).

diffusers-compatible numerics (Attention / BasicTransformerBlock /
Transformer2DModel) with TPU-friendly execution: one fused
``jax.nn.dot_product_attention`` per block (XLA lowers this to a flash
kernel on TPU), bf16-safe, no dropout at inference.

The AudioLDM2 UNet's two conditioning streams (reference:
code/models.py:691-899) use one FULL Transformer2DModel per stream,
interleaved in the blocks' attention lists — see
unet2d.UNet2DConditionModel._attn_layer.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..ops.flash_attention import fused_attention


def mask_to_bias(mask: Optional[jnp.ndarray], dtype) -> Optional[jnp.ndarray]:
    """(B, K) boolean/0-1 keep-mask -> additive (B, 1, 1, K) bias of 0/-1e4.

    Matches the reference's mask convention (code/models.py:199-210).
    """
    if mask is None:
        return None
    bias = (1.0 - mask.astype(dtype)) * -10000.0
    return bias[:, None, None, :]


class Attention(nn.Module):
    """Multi-head attention with separate q and kv sources (diffusers Attention)."""

    query_dim: int
    heads: int
    head_dim: int
    cross_attention_dim: Optional[int] = None
    out_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # (B, Q, C)
        context: Optional[jnp.ndarray] = None,  # (B, K, Ckv)
        attention_bias: Optional[jnp.ndarray] = None,  # (B, 1, 1, K) additive
    ) -> jnp.ndarray:
        inner = self.heads * self.head_dim
        ctx = hidden_states if context is None else context

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(hidden_states)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        b, ql, _ = q.shape
        kl = k.shape[1]
        q = q.reshape(b, ql, self.heads, self.head_dim)
        k = k.reshape(b, kl, self.heads, self.head_dim)
        v = v.reshape(b, kl, self.heads, self.head_dim)

        out = fused_attention(q, k, v, bias=attention_bias)
        out = out.reshape(b, ql, inner)
        out = nn.Dense(self.query_dim, use_bias=self.out_bias, dtype=self.dtype, name="to_out_0")(out)
        return out


class GEGLUFeedForward(nn.Module):
    """GEGLU feed-forward (diffusers FeedForward with geglu activation)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, dtype=self.dtype, name="net_0_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn -> GEGLU FF, pre-LayerNorm."""

    dim: int
    heads: int
    head_dim: int
    cross_attention_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        context_bias: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + Attention(
            self.dim, self.heads, self.head_dim, dtype=self.dtype, name="attn1"
        )(h)

        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        # If no context is supplied, attn2 degrades to self-attention —
        # exactly diffusers' behaviour with encoder_hidden_states=None
        # (this is the AudioLDM conditioning mode: FiLM-only, attn2 = self).
        x = x + Attention(
            self.dim,
            self.heads,
            self.head_dim,
            cross_attention_dim=self.cross_attention_dim,
            dtype=self.dtype,
            name="attn2",
        )(h, context=context, attention_bias=context_bias if context is not None else None)

        h = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        x = x + GEGLUFeedForward(self.dim, dtype=self.dtype, name="ff")(h)
        return x


class Transformer2DModel(nn.Module):
    """Spatial transformer over (B, H, W, C) feature maps (diffusers
    Transformer2DModel): GroupNorm -> proj_in -> N blocks -> proj_out + residual."""

    in_channels: int
    heads: int
    head_dim: int
    depth: int = 1
    cross_attention_dim: Optional[int] = None
    use_linear_projection: bool = False
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # NHWC
        context: Optional[jnp.ndarray] = None,
        context_bias: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        b, h_, w_, c = x.shape
        inner = self.heads * self.head_dim
        residual = x

        x = nn.GroupNorm(
            num_groups=self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="norm"
        )(x)
        if self.use_linear_projection:
            x = x.reshape(b, h_ * w_, c)
            x = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)
        else:
            x = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(x)
            x = x.reshape(b, h_ * w_, inner)

        for i in range(self.depth):
            x = BasicTransformerBlock(
                inner,
                self.heads,
                self.head_dim,
                cross_attention_dim=self.cross_attention_dim,
                dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(x, context, context_bias)

        if self.use_linear_projection:
            x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
            x = x.reshape(b, h_, w_, c)
        else:
            x = x.reshape(b, h_, w_, inner)
            x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + residual
