"""HiFi-GAN vocoder (Flax, NLC) — mel spectrogram -> 16 kHz waveform.

Architecture of the reference's vocoder (code/audioldm/hifigan/models.py:20-174;
identical to transformers' SpeechT5HifiGan used inside the diffusers AudioLDM
pipelines, including the optional input mean/scale normalization).

Torch ConvTranspose1d semantics are reproduced exactly via
lhs-dilated convolution so converted checkpoints are bit-compatible.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

LRELU_SLOPE = 0.1


@dataclasses.dataclass(frozen=True)
class HifiGanConfig:
    """Reference HIFIGAN_16K_64 config (code/audioldm/hifigan/utilities.py:9-39)."""

    model_in_dim: int = 64
    upsample_initial_channel: int = 1024
    upsample_rates: Tuple[int, ...] = (5, 4, 2, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 8, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    sampling_rate: int = 16000
    normalize_before: bool = False  # SpeechT5HifiGan stats normalization


def conv1d(x, features, kernel, stride=1, dilation=1, name=None, dtype=jnp.float32):
    pad = (kernel * dilation - dilation) // 2
    return nn.Conv(
        features, (kernel,), strides=(stride,), padding=[(pad, pad)],
        kernel_dilation=(dilation,), dtype=dtype, name=name,
    )(x)


class ConvTranspose1dTorch(nn.Module):
    """ConvTranspose1d with exact torch semantics:
    out_len = (L-1)*stride - 2*padding + kernel."""

    features: int
    kernel: int
    stride: int
    padding: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, L, C_in)
        c_in = x.shape[-1]
        # kernel stored flipped-and-transposed relative to torch's
        # (in, out, k) ConvTranspose weight; the converter handles the flip.
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, c_in, self.features),
            self.dtype,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), self.dtype)
        pad = self.kernel - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        return y + b


class ResBlock(nn.Module):
    """Multi-dilation residual block (reference: hifigan/models.py:20-103)."""

    channels: int
    kernel: int
    dilations: Tuple[int, ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, LRELU_SLOPE)
            h = conv1d(h, self.channels, self.kernel, dilation=d, name=f"convs1_{i}", dtype=self.dtype)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            h = conv1d(h, self.channels, self.kernel, dilation=1, name=f"convs2_{i}", dtype=self.dtype)
            x = x + h
        return x


class HifiGanGenerator(nn.Module):
    """mel (B, T, n_mels) -> waveform (B, T * prod(upsample_rates)).

    (reference: hifigan/models.py:112-165; prod(5,4,2,2,2)=160 = the STFT hop,
    so output samples == input frames * hop.)
    """

    config: HifiGanConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = mel
        if cfg.normalize_before:
            mean = self.param("mean", nn.initializers.zeros, (cfg.model_in_dim,), self.dtype)
            scale = self.param("scale", nn.initializers.ones, (cfg.model_in_dim,), self.dtype)
            x = (x - mean) / scale

        x = conv1d(x, cfg.upsample_initial_channel, 7, name="conv_pre", dtype=self.dtype)
        num_kernels = len(cfg.resblock_kernel_sizes)
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            x = nn.leaky_relu(x, LRELU_SLOPE)
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            x = ConvTranspose1dTorch(
                ch, k, u, (k - u) // 2, dtype=self.dtype, name=f"ups_{i}"
            )(x)
            xs = None
            for j, (rk, rd) in enumerate(
                zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
            ):
                r = ResBlock(ch, rk, tuple(rd), dtype=self.dtype,
                             name=f"resblocks_{i * num_kernels + j}")(x)
                xs = r if xs is None else xs + r
            x = xs / num_kernels
        x = nn.leaky_relu(x, 0.01)  # torch F.leaky_relu default slope
        x = conv1d(x, 1, 7, name="conv_post", dtype=self.dtype)
        x = jnp.tanh(x)
        return x[..., 0]
