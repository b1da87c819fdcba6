"""Resnet / up-down sampling blocks (diffusers-compatible, NHWC Flax)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn


class ResnetBlock2D(nn.Module):
    """GroupNorm-SiLU-Conv x2 with time-embedding bias (diffusers ResnetBlock2D)."""

    out_channels: int
    use_time_emb: bool = True
    norm_num_groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        in_channels = x.shape[-1]
        residual = x

        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=self.eps, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)

        if self.use_time_emb and temb is not None:
            temb = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
            h = h + temb[:, None, None, :]

        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=self.eps, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)

        if in_channels != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(residual)
        return residual + h


class Downsample2D(nn.Module):
    """stride-2 3x3 conv (diffusers Downsample2D with use_conv=True, padding=1)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype, name="conv")(x)


class Upsample2D(nn.Module):
    """nearest x2 then 3x3 conv (diffusers Upsample2D)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, output_size=None) -> jnp.ndarray:
        b, h, w, c = x.shape
        if output_size is None:
            output_size = (h * 2, w * 2)
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        # forced interpolation output size for non-multiple inputs
        # (reference: models.py:181-189, 363-366): crop after nearest x2
        x = x[:, : output_size[0], : output_size[1], :]
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class AttnBlock2D(nn.Module):
    """Single-head (or multi-head) spatial self-attention used inside VAE mid
    blocks (diffusers Attention in AutoencoderKL / vendored AttnBlock —
    reference: code/audioldm/variational_autoencoder/modules.py:185)."""

    channels: int
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        y = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        attn = jnp.einsum("bqc,bkc->bqk", q, k) * (c ** -0.5)
        attn = nn.softmax(attn, axis=-1)
        y = jnp.einsum("bqk,bkc->bqc", attn, v)
        y = nn.Dense(c, dtype=self.dtype, name="to_out_0")(y)
        return residual + y.reshape(b, h, w, c)
