"""AutoencoderKL (Flax, NHWC) — the latent VAE for mel-spectrogram "images".

diffusers-AutoencoderKL-compatible architecture (the reference's VAE path:
code/models.py:495-503 — encode to the posterior *mode* scaled by
``scaling_factor``, decode the inverse). Also covers the vendored
audioldm VAE structurally (reference: code/audioldm/variational_autoencoder/).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import flax.linen as nn

from .resnet import AttnBlock2D, ResnetBlock2D


@dataclasses.dataclass(frozen=True)
class AutoencoderKLConfig:
    in_channels: int = 1
    out_channels: int = 1
    latent_channels: int = 8
    block_out_channels: Tuple[int, ...] = (128, 256, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    mid_block_add_attention: bool = True
    scaling_factor: float = 1.0
    double_z: bool = True  # KL: (mean, logvar); VQ: single latent
    num_vq_embeddings: int = 0  # > 0 for the VQ variant (CelebA-HQ: 8192)

    @property
    def downscale_factor(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


class Encoder(nn.Module):
    config: AutoencoderKLConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i, out_ch in enumerate(cfg.block_out_channels):
            is_final = i == len(cfg.block_out_channels) - 1
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(
                    out_ch, use_time_emb=False, norm_num_groups=cfg.norm_num_groups,
                    eps=1e-6, dtype=self.dtype, name=f"down_blocks_{i}_resnets_{j}",
                )(x)
            if not is_final:
                # diffusers VAE Downsample2D: pad (0,1,0,1), stride-2 conv, no pad
                x = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)])
                x = nn.Conv(
                    out_ch, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype,
                    name=f"down_blocks_{i}_downsamplers_0_conv",
                )(x)
        mid = cfg.block_out_channels[-1]
        x = ResnetBlock2D(mid, use_time_emb=False, norm_num_groups=cfg.norm_num_groups,
                          eps=1e-6, dtype=self.dtype, name="mid_block_resnets_0")(x)
        if cfg.mid_block_add_attention:
            x = AttnBlock2D(mid, norm_num_groups=cfg.norm_num_groups, dtype=self.dtype,
                            name="mid_block_attentions_0")(x)
        x = ResnetBlock2D(mid, use_time_emb=False, norm_num_groups=cfg.norm_num_groups,
                          eps=1e-6, dtype=self.dtype, name="mid_block_resnets_1")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6, dtype=self.dtype,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        out_ch = (2 if cfg.double_z else 1) * cfg.latent_channels
        x = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        return x


class Decoder(nn.Module):
    config: AutoencoderKLConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        rev = tuple(reversed(cfg.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        x = ResnetBlock2D(rev[0], use_time_emb=False, norm_num_groups=cfg.norm_num_groups,
                          eps=1e-6, dtype=self.dtype, name="mid_block_resnets_0")(x)
        if cfg.mid_block_add_attention:
            x = AttnBlock2D(rev[0], norm_num_groups=cfg.norm_num_groups, dtype=self.dtype,
                            name="mid_block_attentions_0")(x)
        x = ResnetBlock2D(rev[0], use_time_emb=False, norm_num_groups=cfg.norm_num_groups,
                          eps=1e-6, dtype=self.dtype, name="mid_block_resnets_1")(x)
        for i, out_ch in enumerate(rev):
            is_final = i == len(rev) - 1
            for j in range(cfg.layers_per_block + 1):
                x = ResnetBlock2D(
                    out_ch, use_time_emb=False, norm_num_groups=cfg.norm_num_groups,
                    eps=1e-6, dtype=self.dtype, name=f"up_blocks_{i}_resnets_{j}",
                )(x)
            if not is_final:
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_blocks_{i}_upsamplers_0_conv")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6, dtype=self.dtype,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        return x


class AutoencoderKL(nn.Module):
    """KL-VAE with encode-to-mode / decode entry points.

    encode(x): NHWC image -> latent mode (NHWC, latent_channels), already
    multiplied by scaling_factor (reference: models.py:495-500).
    decode(z): latent (NHWC) -> image; divides by scaling_factor first
    (reference: models.py:502-503).
    """

    config: AutoencoderKLConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1), dtype=self.dtype)

    def encode_moments(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.quant_conv(self.encoder(x))

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        moments = self.encode_moments(x)
        mean, _logvar = jnp.split(moments, 2, axis=-1)
        return mean * self.config.scaling_factor

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        z = z / self.config.scaling_factor
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.decode(self.encode(x))


class VQModel(nn.Module):
    """VQ-VAE (diffusers VQModel) — the CelebA-HQ LDM autoencoder.

    encode(x): NHWC image -> continuous pre-quantization latents (the
    reference edits in this space: models.py:1012-1015 uses
    ``vqvae.encode(x).latents`` WITHOUT quantizing).
    decode(z): nearest-codebook quantization, then decode
    (models.py:1017-1018 — diffusers VQModel.decode quantizes by default).
    """

    config: AutoencoderKLConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert not self.config.double_z and self.config.num_vq_embeddings > 0
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(self.config.latent_channels, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1), dtype=self.dtype)
        self.codebook = self.param(
            "codebook", nn.initializers.uniform(scale=2.0 / self.config.num_vq_embeddings),
            (self.config.num_vq_embeddings, self.config.latent_channels), jnp.float32,
        )

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.quant_conv(self.encoder(x))

    def quantize(self, z: jnp.ndarray) -> jnp.ndarray:
        """Nearest-neighbour codebook lookup, (B, H, W, C) -> same shape."""
        flat = z.reshape(-1, z.shape[-1])
        d = (jnp.sum(flat ** 2, axis=1, keepdims=True)
             - 2.0 * flat @ self.codebook.T
             + jnp.sum(self.codebook ** 2, axis=1)[None, :])
        idx = jnp.argmin(d, axis=1)
        return self.codebook[idx].reshape(z.shape).astype(z.dtype)

    def decode(self, z: jnp.ndarray, force_not_quantize: bool = False) -> jnp.ndarray:
        if not force_not_quantize:
            z = self.quantize(z)
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.decode(self.encode(x))
