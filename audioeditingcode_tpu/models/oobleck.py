"""Oobleck VAE (Stable Audio's stereo waveform autoencoder) in Flax, NWC.

Re-implementation of the ``AutoencoderOobleck`` the reference uses for
Stable Audio latents (reference: code/models.py:1118-1140 —
``vae.encode(...).latent_dist.sample()`` / ``vae.decode(x).sample``;
latents (B, 64, 1024) at hop 2048 over 44.1 kHz stereo).

Architecture (stable-audio-open-1.0 vae/config.json): Snake-activated 1-D
conv stacks; encoder strides (2,4,4,8,8) with channel multiples
(1,2,4,8,16); three dilated residual units (1,3,9) per block; decoder
mirrors with transposed convs. The torch checkpoint stores weight-normed
convs — the converter folds g*v/||v|| into plain kernels at conversion time.

TPU notes: everything is NWC (flax 1-D conv native layout); Snake runs on
the VPU and XLA fuses it into the adjacent convs; the strided/transposed
convs are MXU matmuls after im2col.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class OobleckConfig:
    encoder_hidden_size: int = 128
    downsampling_ratios: Tuple[int, ...] = (2, 4, 4, 8, 8)
    channel_multiples: Tuple[int, ...] = (1, 2, 4, 8, 16)
    decoder_channels: int = 128
    decoder_input_channels: int = 64  # latent channels
    audio_channels: int = 2
    sampling_rate: int = 44100

    @property
    def hop_length(self) -> int:
        return math.prod(self.downsampling_ratios)


class Snake1d(nn.Module):
    """x + (1/(beta+eps)) * sin(alpha x)^2 with per-channel log-scale params."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, W, C)
        alpha = self.param("alpha", nn.initializers.zeros, (1, 1, self.channels), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (1, 1, self.channels), jnp.float32)
        a, b = jnp.exp(alpha), jnp.exp(beta)
        return (x + (1.0 / (b + 1e-9)) * jnp.sin(a * x) ** 2).astype(self.dtype)


class ResidualUnit(nn.Module):
    """snake -> dilated conv k=7 -> snake -> conv k=1, residual add."""

    channels: int
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = ((7 - 1) * self.dilation) // 2
        h = Snake1d(self.channels, dtype=self.dtype, name="snake1")(x)
        h = nn.Conv(self.channels, (7,), kernel_dilation=(self.dilation,),
                    padding=[(pad, pad)], dtype=self.dtype, name="conv1")(h)
        h = Snake1d(self.channels, dtype=self.dtype, name="snake2")(h)
        h = nn.Conv(self.channels, (1,), dtype=self.dtype, name="conv2")(h)
        return x + h


class EncoderBlock(nn.Module):
    in_channels: int
    out_channels: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, dil in enumerate((1, 3, 9)):
            x = ResidualUnit(self.in_channels, dil, dtype=self.dtype,
                             name=f"res_unit{i + 1}")(x)
        x = Snake1d(self.in_channels, dtype=self.dtype, name="snake1")(x)
        k = 2 * self.stride
        pad = math.ceil(self.stride / 2)
        return nn.Conv(self.out_channels, (k,), strides=(self.stride,),
                       padding=[(pad, pad)], dtype=self.dtype, name="conv1")(x)


class DecoderBlock(nn.Module):
    in_channels: int
    out_channels: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Snake1d(self.in_channels, dtype=self.dtype, name="snake1")(x)
        k = 2 * self.stride
        pad = math.ceil(self.stride / 2)
        # torch ConvTranspose1d(k, stride, padding=pad): out = (in-1)*s + k - 2*pad.
        # flax VALID gives (in-1)*s + k; slice off `pad` each side for parity.
        x = nn.ConvTranspose(self.out_channels, (k,), strides=(self.stride,),
                             padding="VALID", transpose_kernel=True,
                             dtype=self.dtype, name="conv_t1")(x)
        x = x[:, pad: x.shape[1] - pad, :]
        for i, dil in enumerate((1, 3, 9)):
            x = ResidualUnit(self.out_channels, dil, dtype=self.dtype,
                             name=f"res_unit{i + 1}")(x)
        return x


class OobleckEncoder(nn.Module):
    config: OobleckConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, audio):  # (B, W, audio_channels)
        cfg = self.config
        c = cfg.encoder_hidden_size
        x = nn.Conv(c, (7,), padding=[(3, 3)], dtype=self.dtype, name="conv1")(audio)
        mult = 1
        for i, stride in enumerate(cfg.downsampling_ratios):
            out_mult = cfg.channel_multiples[i]
            x = EncoderBlock(c * mult, c * out_mult, stride, dtype=self.dtype,
                             name=f"block_{i}")(x)
            mult = out_mult
        x = Snake1d(c * mult, dtype=self.dtype, name="snake1")(x)
        # 2x latent channels: (mean, log-ish scale)
        return nn.Conv(2 * cfg.decoder_input_channels, (3,), padding=[(1, 1)],
                       dtype=self.dtype, name="conv2")(x)


class OobleckDecoder(nn.Module):
    config: OobleckConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):  # (B, L, latent_channels)
        cfg = self.config
        c = cfg.decoder_channels
        mults = cfg.channel_multiples
        x = nn.Conv(c * mults[-1], (7,), padding=[(3, 3)], dtype=self.dtype,
                    name="conv1")(z)
        strides = cfg.downsampling_ratios[::-1]
        rev_mults = (1,) + tuple(mults)
        for i, stride in enumerate(strides):
            in_m = rev_mults[len(strides) - i]
            out_m = rev_mults[len(strides) - i - 1]
            x = DecoderBlock(c * in_m, c * out_m, stride, dtype=self.dtype,
                             name=f"block_{i}")(x)
        x = Snake1d(c, dtype=self.dtype, name="snake1")(x)
        return nn.Conv(cfg.audio_channels, (7,), padding=[(3, 3)], use_bias=False,
                       dtype=self.dtype, name="conv2")(x)


class AutoencoderOobleck(nn.Module):
    """encode: waveform (B, W, 2) -> (mean, std); decode: latent -> waveform."""

    config: OobleckConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = OobleckEncoder(self.config, dtype=self.dtype)
        self.decoder = OobleckDecoder(self.config, dtype=self.dtype)

    def __call__(self, audio, rng):
        mean, std = self.encode(audio)
        z = mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)
        return self.decode(z)

    def encode(self, audio):
        h = self.encoder(audio)
        mean, scale = jnp.split(h, 2, axis=-1)
        # OobleckDiagonalGaussianDistribution: std = softplus(scale) + 1e-4
        std = nn.softplus(scale) + 1e-4
        return mean, std

    def encode_sample(self, audio, rng):
        mean, std = self.encode(audio)
        return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)

    def decode(self, z):
        return self.decoder(z)
