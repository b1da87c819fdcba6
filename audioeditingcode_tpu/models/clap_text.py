"""Flax CLAP text tower (RoBERTa encoder + pooler + projection).

Completes the JAX CLAP migration started by models/clap_audio.py: the
eval tower's text embeddings (CLAP consistency — reference
evals/meta_clap_consistency.py:89-139) run on JAX too. Numerics mirror
transformers' ClapTextModel (a RobertaModel copy): Roberta position ids
from the padding mask, post-LayerNorm encoder blocks, dense+tanh CLS
pooler, then ClapProjectionLayer (linear-relu-linear).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple

import jax.numpy as jnp

from .clap_audio import _gelu, _layer_norm, _linear


@dataclasses.dataclass(frozen=True)
class ClapTextConfig:
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 1


def clap_text_forward(
    params: Dict,
    input_ids: jnp.ndarray,  # (B, L) int
    attention_mask: jnp.ndarray,  # (B, L) 1 = keep
    cfg: ClapTextConfig,
) -> jnp.ndarray:
    """Returns the pooled output (B, H) — transformers ClapTextModel
    ``pooler_output`` (dense + tanh over the CLS position)."""
    eps = cfg.layer_norm_eps
    emb = params["embeddings"]
    # Roberta position ids: cumsum over the padding mask, offset by pad id
    # (modeling_clap.py create_position_ids_from_input_ids)
    mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
    pos_ids = jnp.cumsum(mask, axis=1) * mask + cfg.pad_token_id

    x = (emb["word_embeddings"][input_ids]
         + emb["position_embeddings"][pos_ids]
         + emb["token_type_embeddings"][0][None, None])
    x = _layer_norm(x, emb["LayerNorm"], eps)

    bias = (1.0 - attention_mask[:, None, None, :].astype(x.dtype)) * -1e9

    for lp in params["layers"]:
        B, L, H = x.shape
        heads = cfg.num_attention_heads
        hd = H // heads
        q = _linear(x, lp["query"]).reshape(B, L, heads, hd).transpose(0, 2, 1, 3)
        k = _linear(x, lp["key"]).reshape(B, L, heads, hd).transpose(0, 2, 1, 3)
        v = _linear(x, lp["value"]).reshape(B, L, heads, hd).transpose(0, 2, 1, 3)
        s = (q @ k.transpose(0, 1, 3, 2)) / math.sqrt(hd) + bias
        p = jnp.exp(s - s.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        ctx = (p @ v).transpose(0, 2, 1, 3).reshape(B, L, H)
        x = _layer_norm(x + _linear(ctx, lp["attn_out"]), lp["attn_ln"], eps)
        h = _gelu(_linear(x, lp["intermediate"]))
        x = _layer_norm(x + _linear(h, lp["output"]), lp["out_ln"], eps)

    pooled = jnp.tanh(_linear(x[:, 0], params["pooler"]))
    return pooled


def clap_text_embed(params: Dict, pooled: jnp.ndarray) -> jnp.ndarray:
    """ClapProjectionLayer + L2 normalization (ClapModel.get_text_features)."""
    h = _linear(pooled, params["projection"]["linear1"])
    h = jnp.maximum(h, 0.0)
    h = _linear(h, params["projection"]["linear2"])
    return h / jnp.linalg.norm(h, axis=-1, keepdims=True)


def text_params_from_torch_clap(model) -> Tuple[Dict, ClapTextConfig]:
    """Params from a torch ``transformers.ClapModel`` (text tower +
    text_projection)."""
    tm = model.text_model
    tcfg = model.config.text_config if hasattr(model.config, "text_config") \
        else model.config
    cfg = ClapTextConfig(
        num_hidden_layers=tcfg.num_hidden_layers,
        num_attention_heads=tcfg.num_attention_heads,
        layer_norm_eps=tcfg.layer_norm_eps,
        pad_token_id=tcfg.pad_token_id,
    )

    def t(x):
        return jnp.asarray(x.detach().cpu().numpy())

    def lin(mod):
        p = {"weight": t(mod.weight)}
        if mod.bias is not None:
            p["bias"] = t(mod.bias)
        return p

    def ln(mod):
        return {"weight": t(mod.weight), "bias": t(mod.bias)}

    params: Dict = {
        "embeddings": {
            "word_embeddings": t(tm.embeddings.word_embeddings.weight),
            "position_embeddings": t(tm.embeddings.position_embeddings.weight),
            "token_type_embeddings": t(tm.embeddings.token_type_embeddings.weight),
            "LayerNorm": ln(tm.embeddings.LayerNorm),
        },
        "pooler": lin(tm.pooler.dense),
        "layers": [],
        "projection": {
            "linear1": lin(model.text_projection.linear1),
            "linear2": lin(model.text_projection.linear2),
        },
    }
    for layer in tm.encoder.layer:
        params["layers"].append({
            "query": lin(layer.attention.self.query),
            "key": lin(layer.attention.self.key),
            "value": lin(layer.attention.self.value),
            "attn_out": lin(layer.attention.output.dense),
            "attn_ln": ln(layer.attention.output.LayerNorm),
            "intermediate": lin(layer.intermediate.dense),
            "output": lin(layer.output.dense),
            "out_ln": ln(layer.output.LayerNorm),
        })
    return params, cfg
