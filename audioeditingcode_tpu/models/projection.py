"""Stable Audio conditioning projections: text projection + duration embeds.

Re-implementation of HF diffusers' ``StableAudioProjectionModel`` as used by
the reference (reference: code/models.py:1089 — text embeds through
``projection_model``; models.py:1160-1164 — ``encode_duration`` producing
seconds_start / seconds_end hidden states that are appended to the
cross-attention stream and concatenated into the global token).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class ProjectionConfig:
    text_encoder_dim: int = 768
    conditioning_dim: int = 768
    min_value: float = 0.0
    max_value: float = 512.0
    internal_dim: int = 256  # fourier feature dim of the number embedder


class PositionalEmbedding(nn.Module):
    """StableAudioPositionalEmbedding: t -> [t, sin(2pi t w), cos(2pi t w)]."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, times):  # (B,)
        weights = self.param(
            "weights", nn.initializers.normal(1.0), (self.dim // 2,), jnp.float32
        )
        t = times[:, None]
        freqs = t * weights[None, :] * 2.0 * jnp.pi
        fouriered = jnp.concatenate([jnp.sin(freqs), jnp.cos(freqs)], axis=-1)
        return jnp.concatenate([t, fouriered], axis=-1).astype(self.dtype)  # (B, dim+1)


class NumberConditioner(nn.Module):
    """StableAudioNumberConditioner: clamp -> normalize -> fourier -> Linear."""

    cfg: ProjectionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, floats):  # (B,)
        c = self.cfg
        x = jnp.clip(floats, c.min_value, c.max_value)
        x = (x - c.min_value) / (c.max_value - c.min_value)
        emb = PositionalEmbedding(c.internal_dim, dtype=self.dtype,
                                  name="time_positional_embedding_0")(x)
        emb = nn.Dense(c.conditioning_dim, dtype=self.dtype,
                       name="time_positional_embedding_1")(emb)
        return emb[:, None, :]  # (B, 1, D)


class StableAudioProjectionModel(nn.Module):
    """text_projection + start/end number conditioners."""

    cfg: ProjectionConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.text_projection = _TextProj(self.cfg, dtype=self.dtype)
        self.start_number_conditioner = NumberConditioner(self.cfg, dtype=self.dtype)
        self.end_number_conditioner = NumberConditioner(self.cfg, dtype=self.dtype)

    def __call__(self, text_hidden_states):
        return self.text_projection(text_hidden_states)

    def project_text(self, text_hidden_states):
        return self.text_projection(text_hidden_states)

    def encode_duration(self, seconds_start, seconds_end):
        """(B,), (B,) -> ((B,1,D), (B,1,D)) duration hidden states."""
        return (
            self.start_number_conditioner(seconds_start),
            self.end_number_conditioner(seconds_end),
        )


class _TextProj(nn.Module):
    cfg: ProjectionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = nn.Dense(c.conditioning_dim, use_bias=False, dtype=self.dtype, name="0")(x)
        x = nn.silu(x)
        return nn.Dense(c.conditioning_dim, use_bias=False, dtype=self.dtype, name="2")(x)
