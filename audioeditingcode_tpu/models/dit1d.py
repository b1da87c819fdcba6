"""Stable Audio DiT (1-D diffusion transformer) in Flax, NLC layout.

Re-implementation of the ``StableAudioDiTModel`` the reference drives through
``StableAudWrapper.unet_forward`` (reference: code/models.py:1331-1354 —
text+duration embeds concatenated into the cross-attention stream, duration
embeds as the prepended global token, 1-D rotary embeddings precomputed per
sequence length via ``get_1d_rotary_pos_embed``, models.py:1167-1172).

TPU-first notes:
- sequence layout is (B, L, C) end to end; the two 1x1 "conv" pre/post
  layers are pointwise Dense ops (identical math, MXU-friendly);
- grouped-query attention (24 query / 12 kv heads) is computed by repeating
  kv heads after projection — XLA fuses the repeat into the attention
  einsums;
- rotary tables are passed in as (cos, sin) arrays so the editing scans can
  precompute them once per latent length (no trig in the hot loop).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..ops.flash_attention import fused_attention
from ..ops.swiglu import fused_swiglu


@dataclasses.dataclass(frozen=True)
class DiT1DConfig:
    """Mirrors the stable-audio-open-1.0 transformer/config.json."""

    sample_size: int = 1024
    in_channels: int = 64
    out_channels: int = 64
    num_layers: int = 24
    attention_head_dim: int = 64
    num_attention_heads: int = 24
    num_key_value_attention_heads: int = 12
    cross_attention_dim: int = 768
    cross_attention_input_dim: int = 768
    global_states_input_dim: int = 1536
    time_proj_dim: int = 256

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def rotary_embed_dim(self) -> int:
        # reference: models.py:1167 — StableAudioPipeline.rotary_embed_dim
        # (= attention_head_dim // 2; rotary applied to the first half of
        # each head's features)
        return self.attention_head_dim // 2


def rotary_tables(dim: int, seq_len: int, theta: float = 10000.0):
    """(cos, sin) tables of get_1d_rotary_pos_embed(use_real=True,
    repeat_interleave_real=False): each (seq_len, dim) with the dim/2
    frequencies tiled twice (rotate-half convention)."""
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64)[: dim // 2] / dim))
    angles = np.outer(np.arange(seq_len, dtype=np.float64), freqs)  # (S, dim/2)
    cos = np.concatenate([np.cos(angles), np.cos(angles)], axis=-1)
    sin = np.concatenate([np.sin(angles), np.sin(angles)], axis=-1)
    return jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32)


class GaussianFourierProjection(nn.Module):
    """Fixed random Fourier features for the continuous timestep
    (StableAudioGaussianFourierProjection: flip_sin_to_cos=True, log=False)."""

    embedding_size: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t):  # (B,)
        weight = self.param(
            "weight", nn.initializers.normal(1.0), (self.embedding_size,), jnp.float32
        )
        proj = 2.0 * jnp.pi * t[:, None] * weight[None, :]
        # flip_sin_to_cos=True -> [cos, sin]
        return jnp.concatenate([jnp.cos(proj), jnp.sin(proj)], axis=-1).astype(self.dtype)


class MLPProj(nn.Module):
    """Linear -> SiLU -> Linear (timestep / global / cross-attn projections)."""

    out_dim: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_dim, use_bias=self.use_bias, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        return nn.Dense(self.out_dim, use_bias=self.use_bias, dtype=self.dtype, name="linear_2")(x)


class GQAttention(nn.Module):
    """Grouped-query attention with optional partial rotary embedding."""

    heads: int
    kv_heads: int
    head_dim: int
    cross_dim: Optional[int] = None  # kv source dim (None = self-attention)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, context_bias=None, rotary=None):
        B, S, _ = x.shape
        ctx = x if context is None else context
        inner = self.heads * self.head_dim
        kv_inner = self.kv_heads * self.head_dim

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(kv_inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(kv_inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        # (B, S, H, D) layout end to end — the fused_attention contract; no
        # (S, S) score matrix ever reaches HBM on the self-attention path
        # (Pallas blocked kernel / XLA fused attention underneath).
        q = q.reshape(B, S, self.heads, self.head_dim)
        k = k.reshape(B, ctx.shape[1], self.kv_heads, self.head_dim)
        v = v.reshape(B, ctx.shape[1], self.kv_heads, self.head_dim)

        # grouped k/v heads pass through unexpanded — both the Pallas kernel
        # (kv-group index map) and jax.nn.dot_product_attention handle GQA
        # natively, so shared K/V never hits HBM heads/kv_heads times.
        # The partial rotary embedding travels as (cos, sin) tables and is
        # applied inside the attention kernel on the Pallas path (rotated
        # q/k never round-trip through HBM).
        bias = None
        if context_bias is not None:
            bias = context_bias[:, None, None, :].astype(jnp.float32)
        out = fused_attention(q, k, v, bias=bias, rotary=rotary)
        out = out.reshape(B, S, inner)
        return nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_out_0")(out)


class _SwiGLUProj(nn.Module):
    """Dense(2N) + chunk + h*silu(gate) as ONE op. Param layout is exactly
    ``nn.Dense(2N)``'s ({kernel, bias}) so checkpoints and the converter are
    unaffected; compute dispatches to the fused Pallas kernel
    (ops/swiglu.py) which keeps the (M, 2N) intermediate out of HBM."""

    features: int  # 2 * inner
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,),
            jnp.float32)
        return fused_swiglu(x.astype(self.dtype), kernel.astype(self.dtype),
                            bias)


class SwiGLUFeedForward(nn.Module):
    """FeedForward(activation_fn='swiglu'): Dense(2*4d) -> h * silu(gate) -> Dense(d)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = _SwiGLUProj(features=inner * 2, dtype=self.dtype,
                        name="net_0_proj")(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(h)


class DiTBlock(nn.Module):
    """StableAudioDiTBlock: pre-LN self-attn (rotary) -> cross-attn -> SwiGLU FF."""

    config: DiT1DConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, context_bias, rotary):
        cfg = self.config
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + GQAttention(
            heads=cfg.num_attention_heads,
            kv_heads=cfg.num_key_value_attention_heads,
            head_dim=cfg.attention_head_dim,
            dtype=self.dtype,
            name="attn1",
        )(h, rotary=rotary)

        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        x = x + GQAttention(
            heads=cfg.num_attention_heads,
            kv_heads=cfg.num_key_value_attention_heads,
            head_dim=cfg.attention_head_dim,
            cross_dim=cfg.cross_attention_dim,
            dtype=self.dtype,
            name="attn2",
        )(h, context=context, context_bias=context_bias)

        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm3")(x)
        x = x + SwiGLUFeedForward(dim=cfg.inner_dim, dtype=self.dtype, name="ff")(h)
        return x


class StableAudioDiT(nn.Module):
    """The full DiT: latent (B, L, C) + t + text/duration conditioning -> v-pred."""

    config: DiT1DConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, L, C_in) NLC
        timestep: jnp.ndarray,  # (B,) continuous t in (0, 1)
        encoder_hidden_states: jnp.ndarray,  # (B, K, cross_in) text+duration
        global_hidden_states: jnp.ndarray,  # (B, 1, global_in) duration global token
        rotary: Tuple[jnp.ndarray, jnp.ndarray],  # cos/sin (L+1, rot_dim)
        encoder_attention_bias: Optional[jnp.ndarray] = None,  # (B, K) additive
    ) -> jnp.ndarray:
        cfg = self.config

        t_feat = GaussianFourierProjection(
            embedding_size=cfg.time_proj_dim // 2, dtype=self.dtype, name="time_proj"
        )(timestep.astype(jnp.float32))
        t_emb = MLPProj(cfg.inner_dim, use_bias=True, dtype=self.dtype,
                        name="timestep_proj")(t_feat)

        g = MLPProj(cfg.inner_dim, use_bias=False, dtype=self.dtype,
                    name="global_proj")(global_hidden_states)
        g = g + t_emb[:, None, :]

        ctx = MLPProj(cfg.cross_attention_dim, use_bias=False, dtype=self.dtype,
                      name="cross_attention_proj")(encoder_hidden_states)

        # pointwise pre-conv (Conv1d k=1, no bias) + residual
        x = sample + nn.Dense(cfg.in_channels, use_bias=False, dtype=self.dtype,
                              name="preprocess_conv")(sample)
        x = nn.Dense(cfg.inner_dim, use_bias=False, dtype=self.dtype, name="proj_in")(x)

        x = jnp.concatenate([g.astype(x.dtype), x], axis=1)  # prepend global token

        for i in range(cfg.num_layers):
            x = DiTBlock(cfg, dtype=self.dtype, name=f"transformer_blocks_{i}")(
                x, ctx, encoder_attention_bias, rotary
            )

        x = nn.Dense(cfg.out_channels, use_bias=False, dtype=self.dtype, name="proj_out")(x)
        x = x[:, 1:]  # drop global token
        x = x + nn.Dense(cfg.out_channels, use_bias=False, dtype=self.dtype,
                         name="postprocess_conv")(x)
        return x
