"""AudioLDM2 conditioning chain: CLAP + FLAN-T5 -> projection -> GPT-2.

Re-implementation of the reference's dual-encoder conditioning path
(reference: code/models.py:599-677): the CLAP text embedding (one pooled
512-d token) and the FLAN-T5 sequence embedding (1024-d) are projected to
the language-model width, framed by learned SOS/EOS embeddings, concatenated,
and fed to a GPT-2 that autoregressively *generates eight new embedding
vectors* (diffusers AudioLDM2Pipeline.generate_language_model). Those eight
vectors drive the UNet's first cross-attention stream; the raw T5 sequence
drives the second (models.py:691-899 dual-cross-attention forward).

The GPT-2 here is a native Flax causal transformer operating directly on
embeddings (transformers' FlaxGPT2Model does not accept inputs_embeds);
weights convert 1:1 from the torch checkpoint (fused c_attn layout).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .text_encoders import TextCond


# ------------------------------------------------------------------ GPT-2
@dataclasses.dataclass(frozen=True)
class GPT2Config:
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    n_positions: int = 1024
    layer_norm_epsilon: float = 1e-5


class GPT2Block(nn.Module):
    config: GPT2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_bias):
        cfg = self.config
        E, H = cfg.n_embd, cfg.n_head
        h = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, dtype=self.dtype, name="ln_1")(x)
        qkv = nn.Dense(3 * E, dtype=self.dtype, name="c_attn")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        B, S, _ = x.shape
        q = q.reshape(B, S, H, E // H).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, H, E // H).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, H, E // H).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(E // H).astype(x.dtype)
        attn = attn + causal_bias
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, S, E)
        x = x + nn.Dense(E, dtype=self.dtype, name="c_proj")(o)

        h = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(4 * E, dtype=self.dtype, name="c_fc")(h)
        h = nn.gelu(h, approximate=True)
        x = x + nn.Dense(E, dtype=self.dtype, name="mlp_c_proj")(h)
        return x


class GPT2Model(nn.Module):
    """Embedding-in, hidden-state-out causal GPT-2 (no vocab head)."""

    config: GPT2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs_embeds, attention_mask=None):
        cfg = self.config
        B, S, E = inputs_embeds.shape
        wpe = self.param("wpe", nn.initializers.normal(0.01),
                         (cfg.n_positions, E), jnp.float32)
        x = inputs_embeds + wpe[None, :S].astype(inputs_embeds.dtype)

        causal = jnp.tril(jnp.ones((S, S), bool))
        bias = jnp.where(causal, 0.0, -1e9)[None, None]
        if attention_mask is not None:
            pad = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)
            bias = bias + pad
        for i in range(cfg.n_layer):
            x = GPT2Block(cfg, dtype=self.dtype, name=f"h_{i}")(x, bias)
        return nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, dtype=self.dtype,
                            name="ln_f")(x)


def generate_language_model(
    gpt2: GPT2Model,
    params,
    inputs_embeds: jnp.ndarray,  # (B, S, E)
    attention_mask: Optional[jnp.ndarray],  # (B, S)
    max_new_tokens: int = 8,
) -> jnp.ndarray:
    """Autoregressively generate ``max_new_tokens`` embedding vectors: each
    step appends the model's final hidden state at the last position
    (diffusers AudioLDM2Pipeline.generate_language_model; reference call
    site models.py:663-667). Returns (B, max_new_tokens, E)."""
    B, S0, E = inputs_embeds.shape
    if attention_mask is None:
        attention_mask = jnp.ones((B, S0), jnp.int32)

    # Fixed-shape masked buffer instead of a growing concat: every step runs
    # the model at the same (B, S0+T, E) shape, so the whole generation is
    # ONE compiled program (the growing version compiles T distinct shapes
    # through the remote-compile tunnel). Causal attention + the pad-mask
    # bias make position S0+i-1's hidden state identical to the truncated
    # computation, so results match the concat loop exactly.
    total = S0 + max_new_tokens
    emb = jnp.pad(inputs_embeds, ((0, 0), (0, max_new_tokens), (0, 0)))
    mask = jnp.pad(attention_mask, ((0, 0), (0, max_new_tokens)))

    def body(carry, i):
        emb, mask = carry
        out = gpt2.apply(params, emb, mask)  # (B, total, E)
        nxt = jax.lax.dynamic_slice_in_dim(out, S0 - 1 + i, 1, axis=1)
        emb = jax.lax.dynamic_update_slice_in_dim(emb, nxt, S0 + i, axis=1)
        mask = jax.lax.dynamic_update_slice_in_dim(
            mask, jnp.ones((B, 1), mask.dtype), S0 + i, axis=1)
        return (emb, mask), None

    (emb, _), _ = jax.lax.scan(body, (emb, mask), jnp.arange(max_new_tokens))
    return emb[:, S0:total, :]


# ---------------------------------------------------------- projection
@dataclasses.dataclass(frozen=True)
class AudioLDM2ProjectionConfig:
    text_encoder_dim: int = 512  # CLAP
    text_encoder_1_dim: int = 1024  # FLAN-T5
    langauge_model_dim: int = 768  # (sic — diffusers field spelling)


class AudioLDM2ProjectionModel(nn.Module):
    """Project both text streams to LM width and frame with SOS/EOS embeds
    (diffusers AudioLDM2ProjectionModel; consumed at models.py:654-661)."""

    config: AudioLDM2ProjectionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, hidden_states_1,
                 attention_mask=None, attention_mask_1=None):
        cfg = self.config
        D = cfg.langauge_model_dim
        init = nn.initializers.normal(0.02)
        sos = self.param("sos_embed", init, (D,), jnp.float32)
        eos = self.param("eos_embed", init, (D,), jnp.float32)
        sos1 = self.param("sos_embed_1", init, (D,), jnp.float32)
        eos1 = self.param("eos_embed_1", init, (D,), jnp.float32)

        hs = nn.Dense(D, dtype=self.dtype, name="projection")(hidden_states)
        hs, mask = _add_special_tokens(hs, attention_mask, sos, eos)
        hs1 = nn.Dense(D, dtype=self.dtype, name="projection_1")(hidden_states_1)
        hs1, mask1 = _add_special_tokens(hs1, attention_mask_1, sos1, eos1)

        return (
            jnp.concatenate([hs, hs1], axis=1),
            jnp.concatenate([mask, mask1], axis=1),
        )


def _add_special_tokens(hs, mask, sos, eos):
    """SOS prepended; EOS written at each row's first padding slot
    (diffusers add_special_tokens semantics)."""
    B, S, D = hs.shape
    if mask is None:
        mask = jnp.ones((B, S), jnp.int32)
    sos_tok = jnp.broadcast_to(sos[None, None].astype(hs.dtype), (B, 1, D))
    eos_tok = jnp.broadcast_to(eos[None, None].astype(hs.dtype), (B, 1, D))
    hs = jnp.concatenate([sos_tok, hs, eos_tok], axis=1)  # (B, S+2, D)
    # each row's true length is mask.sum(); EOS goes at index len+1
    lengths = jnp.sum(mask, axis=1)  # (B,)
    pos = jnp.arange(S + 2)[None, :]  # (1, S+2)
    new_mask = (pos <= (lengths + 1)[:, None]).astype(jnp.int32)
    # move each row's EOS from the fixed end slot to len+1: where pos==len+1
    is_eos = pos[..., None] == (lengths + 1)[:, None, None]  # (B, S+2, 1)
    hs = jnp.where(is_eos, eos_tok, hs)
    # zero embeddings past the EOS (padding region)
    hs = hs * new_mask[..., None].astype(hs.dtype)
    return hs, new_mask


# ---------------------------------------------------------- full chain
class AudioLDM2TextEncoder:
    """The runtime chain: tokenize -> CLAP pooled + T5 sequence -> project ->
    GPT-2 generate -> TextCond(dual streams).

    ``clap_text_features`` / ``t5_features`` are callables mapping a list of
    prompts to (embeds, mask) so the heavy encoders stay pluggable (converted
    transformers-Flax models in production; deterministic stubs in tests).
    """

    def __init__(self, clap_text_features, t5_features,
                 projection: AudioLDM2ProjectionModel, projection_params,
                 gpt2: GPT2Model, gpt2_params, max_new_tokens: int = 8):
        self.clap_text_features = clap_text_features
        self.t5_features = t5_features
        self.projection = projection
        self.projection_params = projection_params
        self.gpt2 = gpt2
        self.gpt2_params = gpt2_params
        self.max_new_tokens = max_new_tokens

    def __call__(self, prompts: List[str], negative: bool = False) -> TextCond:
        clap_emb, clap_mask = self.clap_text_features(prompts)  # (B, 512), (B, K)
        clap_emb = clap_emb[:, None, :]  # pooled -> one token (models.py:636)
        clap_mask = jnp.ones((len(prompts), 1), jnp.int32)  # (models.py:638)
        t5_emb, t5_mask = self.t5_features(prompts)  # (B, K, 1024), (B, K)

        proj_hs, proj_mask = self.projection.apply(
            self.projection_params, clap_emb, t5_emb, clap_mask, t5_mask
        )
        generated = generate_language_model(
            self.gpt2, self.gpt2_params, proj_hs, proj_mask,
            max_new_tokens=self.max_new_tokens,
        )
        return TextCond(
            hidden_states=generated,  # (B, 8, 768) stream 0
            attention_mask=None,
            hidden_states_1=t5_emb,  # (B, K, 1024) stream 1
            attention_mask_1=jnp.asarray(t5_mask),
        )
