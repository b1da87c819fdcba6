"""Conditional 2-D UNet (Flax, NHWC) — the latent-diffusion denoiser.

Config-driven re-implementation of the UNet family the reference drives
through its inline ``unet_forward`` (reference: code/models.py:160-393 for
the generic diffusers UNet2DConditionModel path, code/models.py:691-899 for
the AudioLDM2 dual-cross-attention variant). One module covers:

- AudioLDM:  FiLM conditioning via ``class_labels`` (CLAP text embedding,
  class_embed_type='simple_projection', class_embeddings_concat), attn2
  degrading to self-attention (encoder_hidden_states=None).
- AudioLDM2: dual conditioning streams (generated GPT-2 embeds + T5/CLAP
  projected embeds) — one full Transformer2DModel per stream, interleaved
  per attention position exactly like diffusers'
  AudioLDM2UNet2DConditionModel, so real checkpoints convert name-for-name.
- TANGO / Stable Diffusion: standard single-stream cross-attention.
- CelebA-HQ: unconditional (no attention conditioning, no class embedding).

The h-space / skip-connection surgery hooks of the reference
(replace_h_space, replace_skip_conns, zero_out_resconns —
models.py:336-361) are functional arguments: the forward returns
``(sample, h_space, res_conns)`` and accepts replacements, keeping the
module pure for jit/scan.

Layout: NHWC end to end (TPU-native conv layout). The pipeline layer
transposes from the reference's NCHW latent layout at the boundary.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import flax.linen as nn

from .attention import Transformer2DModel, mask_to_bias
from .embeddings import TimestepEmbedding, get_timestep_embedding
from .resnet import Downsample2D, ResnetBlock2D, Upsample2D


@dataclasses.dataclass(frozen=True)
class UNet2DConditionConfig:
    sample_size: Optional[int] = None
    in_channels: int = 8
    out_channels: int = 8
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    block_out_channels: Tuple[int, ...] = (128, 256, 384, 640)
    layers_per_block: int = 2
    transformer_layers_per_block: int = 1
    norm_num_groups: int = 32
    cross_attention_dim: Optional[int] = None
    num_attention_heads: Union[int, Tuple[int, ...]] = 8
    use_linear_projection: bool = False
    mid_block_type: Optional[str] = "UNetMidBlock2DCrossAttn"
    class_embed_type: Optional[str] = None  # None | 'simple_projection'
    projection_class_embeddings_input_dim: Optional[int] = None
    class_embeddings_concat: bool = False
    double_cross_attention: bool = False  # AudioLDM2 dual streams
    cross_attention_dim_1: Optional[int] = None
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    center_input_sample: bool = False

    def heads_for_block(self, i: int) -> int:
        if isinstance(self.num_attention_heads, int):
            return self.num_attention_heads
        return self.num_attention_heads[i]

    @property
    def num_upsamplers(self) -> int:
        return len(self.up_block_types) - 1


class UNet2DConditionModel(nn.Module):
    config: UNet2DConditionConfig
    dtype: jnp.dtype = jnp.float32

    def _attn(self, channels: int, heads: int, name: str,
              cross_attention_dim: Optional[int]) -> Transformer2DModel:
        cfg = self.config
        return Transformer2DModel(
            in_channels=channels,
            heads=heads,
            head_dim=channels // heads,
            depth=cfg.transformer_layers_per_block,
            cross_attention_dim=cross_attention_dim,
            use_linear_projection=cfg.use_linear_projection,
            norm_num_groups=cfg.norm_num_groups,
            dtype=self.dtype,
            name=name,
        )

    def _attn_layer(self, channels: int, heads: int, prefix: str, j: int,
                    sample, hs, ctx_bias, hs1, ctx1_bias):
        """One attention position — a single Transformer2DModel, or, for the
        AudioLDM2 dual-conditioning UNet, one FULL Transformer2DModel per
        stream, interleaved as ``attentions.{j*2}`` / ``{j*2+1}``. This is
        diffusers' AudioLDM2UNet2DConditionModel layout (the reference
        delegates its blocks there — code/models.py:810-899: the blocks
        receive encoder_hidden_states AND encoder_hidden_states_1 and route
        stream idx 0/1 to consecutive per-stream transformers), so real
        checkpoints convert name-for-name."""
        cfg = self.config
        if not cfg.double_cross_attention:
            return self._attn(
                channels, heads, f"{prefix}_{j}", cfg.cross_attention_dim
            )(sample, hs, ctx_bias)
        sample = self._attn(
            channels, heads, f"{prefix}_{2 * j}", cfg.cross_attention_dim
        )(sample, hs, ctx_bias)
        return self._attn(
            channels, heads, f"{prefix}_{2 * j + 1}", cfg.cross_attention_dim_1
        )(sample, hs1, ctx1_bias)

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, H, W, C_in) NHWC
        timesteps: jnp.ndarray,  # (B,) or scalar
        encoder_hidden_states: Optional[jnp.ndarray] = None,  # (B, K, D)
        class_labels: Optional[jnp.ndarray] = None,
        encoder_attention_mask: Optional[jnp.ndarray] = None,  # (B, K) keep-mask
        encoder_hidden_states_1: Optional[jnp.ndarray] = None,
        encoder_attention_mask_1: Optional[jnp.ndarray] = None,
        mid_block_additional_residual: Optional[jnp.ndarray] = None,
        replace_h_space: Optional[jnp.ndarray] = None,
        replace_skip_conns: Optional[Dict[int, Sequence[jnp.ndarray]]] = None,
        zero_out_resconns: Optional[Union[int, List[int]]] = None,
    ):
        cfg = self.config
        ctx_bias = mask_to_bias(encoder_attention_mask, self.dtype)
        ctx1_bias = mask_to_bias(encoder_attention_mask_1, self.dtype)

        if cfg.center_input_sample:
            sample = 2.0 * sample - 1.0

        # 1. time (reference: models.py:217-256)
        if jnp.ndim(timesteps) == 0:
            timesteps = jnp.broadcast_to(timesteps[None], (sample.shape[0],))
        # diffusers: time_proj dim = block_out_channels[0]; embed dim = 4x
        t_emb = get_timestep_embedding(
            timesteps,
            cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=cfg.freq_shift,
        ).astype(self.dtype)
        emb = TimestepEmbedding(cfg.block_out_channels[0] * 4, dtype=self.dtype, name="time_embedding")(t_emb)

        if cfg.class_embed_type == "simple_projection":
            if class_labels is None:
                raise ValueError("class_labels required for simple_projection embedding")
            class_emb = nn.Dense(
                cfg.block_out_channels[0] * 4, dtype=self.dtype, name="class_embedding"
            )(class_labels.astype(self.dtype))
            if cfg.class_embeddings_concat:
                emb = jnp.concatenate([emb, class_emb], axis=-1)
            else:
                emb = emb + class_emb
        elif cfg.class_embed_type is not None:
            raise NotImplementedError(cfg.class_embed_type)

        # 2. pre-process
        sample = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in"
        )(sample)

        # 3. down
        down_block_res_samples: List[jnp.ndarray] = [sample]
        for i, block_type in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            is_final = i == len(cfg.down_block_types) - 1
            has_attn = block_type == "CrossAttnDownBlock2D"
            for j in range(cfg.layers_per_block):
                sample = ResnetBlock2D(
                    out_ch,
                    norm_num_groups=cfg.norm_num_groups,
                    dtype=self.dtype,
                    name=f"down_blocks_{i}_resnets_{j}",
                )(sample, emb)
                if has_attn:
                    sample = self._attn_layer(
                        out_ch, cfg.heads_for_block(i), f"down_blocks_{i}_attentions", j,
                        sample, encoder_hidden_states, ctx_bias,
                        encoder_hidden_states_1, ctx1_bias,
                    )
                down_block_res_samples.append(sample)
            if not is_final:
                sample = Downsample2D(
                    out_ch, dtype=self.dtype, name=f"down_blocks_{i}_downsamplers_0"
                )(sample)
                down_block_res_samples.append(sample)

        # 4. mid
        if cfg.mid_block_type is not None:
            mid_ch = cfg.block_out_channels[-1]
            sample = ResnetBlock2D(
                mid_ch, norm_num_groups=cfg.norm_num_groups, dtype=self.dtype,
                name="mid_block_resnets_0",
            )(sample, emb)
            sample = self._attn_layer(
                mid_ch, cfg.heads_for_block(len(cfg.block_out_channels) - 1),
                "mid_block_attentions", 0,
                sample, encoder_hidden_states, ctx_bias,
                encoder_hidden_states_1, ctx1_bias,
            )
            sample = ResnetBlock2D(
                mid_ch, norm_num_groups=cfg.norm_num_groups, dtype=self.dtype,
                name="mid_block_resnets_1",
            )(sample, emb)

        # h-space hook (reference: models.py:336-340)
        if replace_h_space is None:
            h_space = sample
        else:
            h_space = replace_h_space
            sample = replace_h_space

        if mid_block_additional_residual is not None:
            sample = sample + mid_block_additional_residual

        # 5. up
        extracted_res_conns: Dict[int, Tuple[jnp.ndarray, ...]] = {}
        for i, block_type in enumerate(cfg.up_block_types):
            rev_i = len(cfg.block_out_channels) - 1 - i
            out_ch = cfg.block_out_channels[rev_i]
            is_final = i == len(cfg.up_block_types) - 1
            has_attn = block_type == "CrossAttnUpBlock2D"
            n_res = cfg.layers_per_block + 1

            res_samples = tuple(down_block_res_samples[-n_res:])
            down_block_res_samples = down_block_res_samples[:-n_res]

            # skip-connection surgery hooks (reference: models.py:352-361)
            if replace_skip_conns is not None and replace_skip_conns.get(i) is not None:
                res_samples = tuple(replace_skip_conns[i])
            if zero_out_resconns is not None:
                if (isinstance(zero_out_resconns, int) and i >= zero_out_resconns - 1) or (
                    isinstance(zero_out_resconns, (list, tuple)) and i in zero_out_resconns
                ):
                    res_samples = tuple(jnp.zeros_like(r) for r in res_samples)
            extracted_res_conns[i] = res_samples

            upsample_size = None
            if not is_final and len(down_block_res_samples) > 0:
                upsample_size = down_block_res_samples[-1].shape[1:3]

            for j in range(n_res):
                res = res_samples[-1 - j]
                sample = jnp.concatenate([sample, res], axis=-1)
                sample = ResnetBlock2D(
                    out_ch,
                    norm_num_groups=cfg.norm_num_groups,
                    dtype=self.dtype,
                    name=f"up_blocks_{i}_resnets_{j}",
                )(sample, emb)
                if has_attn:
                    sample = self._attn_layer(
                        out_ch, cfg.heads_for_block(rev_i), f"up_blocks_{i}_attentions", j,
                        sample, encoder_hidden_states, ctx_bias,
                        encoder_hidden_states_1, ctx1_bias,
                    )
            if not is_final:
                sample = Upsample2D(
                    out_ch, dtype=self.dtype, name=f"up_blocks_{i}_upsamplers_0"
                )(sample, output_size=upsample_size)

        # 6. post-process
        sample = nn.GroupNorm(
            num_groups=cfg.norm_num_groups, epsilon=1e-5, dtype=self.dtype, name="conv_norm_out"
        )(sample)
        sample = nn.silu(sample)
        sample = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(sample)

        return sample, h_space, extracted_res_conns
