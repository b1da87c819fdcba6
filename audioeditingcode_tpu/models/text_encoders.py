"""Text encoders producing UNet conditioning (host-side, once per run).

The reference encodes prompts through CLAP / FLAN-T5 / GPT-2 chains
(code/models.py:511-537, 599-677, 1070-1104). Text encoding runs once per
edit (not in the hot loop), so these are thin host-side wrappers that
produce a :class:`TextCond` pytree consumed by the jitted editing programs.

Implementations:
- NullTextEncoder: deterministic pseudo-embeddings derived from the prompt
  string (for tests, benchmarks and weight-free runs). Empty prompts map to
  zeros, mirroring the semantic role of the unconditional branch.
- ClapTextEncoder / T5TextEncoder: transformers-Flax backed encoders,
  used when converted weights are available (FlaxRobertaModel + projection
  == CLAP text branch; FlaxT5EncoderModel == FLAN-T5).
"""

from __future__ import annotations

import hashlib
from typing import List, Optional

import numpy as np
import jax.numpy as jnp
from flax import struct


class TextCond(struct.PyTreeNode):
    """Conditioning bundle for one batch of prompts (the JAX analogue of the
    reference's PromptEmbeddings + class-label tuple, pc_drift.py:10-13)."""

    hidden_states: Optional[jnp.ndarray] = None  # (P, K, D) cross-attn stream
    class_labels: Optional[jnp.ndarray] = None  # (P, D) FiLM stream (AudioLDM)
    attention_mask: Optional[jnp.ndarray] = None  # (P, K)
    hidden_states_1: Optional[jnp.ndarray] = None  # (P, K1, D1) 2nd stream (AudioLDM2)
    attention_mask_1: Optional[jnp.ndarray] = None  # (P, K1)

    @property
    def batch(self) -> int:
        for f in (self.hidden_states, self.class_labels, self.hidden_states_1):
            if f is not None:
                return f.shape[0]
        return 1


def _map_optional(fn, *conds):
    fields = {}
    for name in ("hidden_states", "class_labels", "attention_mask",
                 "hidden_states_1", "attention_mask_1"):
        vals = [getattr(c, name) for c in conds]
        if all(v is None for v in vals):
            fields[name] = None
        elif any(v is None for v in vals):
            raise ValueError(f"inconsistent TextCond field {name}")
        else:
            fields[name] = fn(vals)
    return TextCond(**fields)


def concat_conds(a: TextCond, b: TextCond) -> TextCond:
    """Batch-concat two conditioning bundles for the fused CFG call.

    The reference never concatenates — it issues separate uncond/cond UNet
    calls (inversion_utils.py:82-93) — so variable-length token streams
    (e.g. T5 with longest-padding: "" vs a real prompt) only meet here.
    Mismatched sequence lengths are right-padded with zero embeddings and
    zero attention mask, which the UNet's additive -1e4 bias excludes from
    attention, so numerics match the reference's unpadded per-call shapes.
    """
    fields = {}
    for hs_name, mask_name in (("hidden_states", "attention_mask"),
                               ("hidden_states_1", "attention_mask_1")):
        hss = [getattr(c, hs_name) for c in (a, b)]
        masks = [getattr(c, mask_name) for c in (a, b)]
        if all(h is None for h in hss):
            fields[hs_name] = fields[mask_name] = None
            continue
        if any(h is None for h in hss):
            raise ValueError(f"inconsistent TextCond field {hs_name}")
        K = max(h.shape[1] for h in hss)
        need_mask = any(m is not None for m in masks) or any(
            h.shape[1] != K for h in hss)
        out_h, out_m = [], []
        for h, m in zip(hss, masks):
            if m is None and need_mask:
                m = jnp.ones(h.shape[:2], jnp.int32)
            if h.shape[1] != K:
                h = jnp.pad(h, ((0, 0), (0, K - h.shape[1]), (0, 0)))
                m = jnp.pad(m, ((0, 0), (0, K - m.shape[1])))
            out_h.append(h)
            out_m.append(m)
        fields[hs_name] = jnp.concatenate(out_h, axis=0)
        fields[mask_name] = (jnp.concatenate(out_m, axis=0)
                             if need_mask else None)
    cls = [c.class_labels for c in (a, b)]
    if all(v is None for v in cls):
        fields["class_labels"] = None
    elif any(v is None for v in cls):
        raise ValueError("inconsistent TextCond field class_labels")
    else:
        fields["class_labels"] = jnp.concatenate(cls, axis=0)
    return TextCond(**fields)


def repeat_cond(c: TextCond, n: int) -> TextCond:
    """expand_for_evs analogue (reference: pc_drift.py:22-26)."""
    if c.batch == n:
        return c
    if c.batch != 1:
        raise ValueError(f"cannot repeat batch {c.batch} to {n}")
    return _map_optional(lambda vs: jnp.repeat(vs[0], n, axis=0), c)


class NullTextEncoder:
    """Deterministic weight-free prompt embeddings for tests/benchmarks.

    Embeddings are seeded from a stable hash of the prompt, so identical
    prompts always produce identical conditioning, and the empty prompt
    produces zeros (the unconditional embedding).
    """

    def __init__(
        self,
        hidden_dim: Optional[int] = None,
        seq_len: int = 8,
        class_dim: Optional[int] = None,
        hidden_dim_1: Optional[int] = None,
        seq_len_1: int = 8,
    ):
        self.hidden_dim = hidden_dim
        self.seq_len = seq_len
        self.class_dim = class_dim
        self.hidden_dim_1 = hidden_dim_1
        self.seq_len_1 = seq_len_1

    def _emb(self, prompt: str, shape) -> np.ndarray:
        if prompt == "":
            return np.zeros(shape, dtype=np.float32)
        seed = int.from_bytes(
            hashlib.sha256(prompt.encode()).digest()[:4], "little"
        )
        rng = np.random.default_rng(seed)
        e = rng.standard_normal(shape).astype(np.float32)
        return e / np.linalg.norm(e, axis=-1, keepdims=True)

    def __call__(self, prompts: List[str], negative: bool = False) -> TextCond:
        hs = cls = hs1 = mask = mask1 = None
        if self.hidden_dim is not None:
            hs = jnp.asarray(
                np.stack([self._emb(p, (self.seq_len, self.hidden_dim)) for p in prompts])
            )
            mask = jnp.ones((len(prompts), self.seq_len), dtype=jnp.int32)
        if self.class_dim is not None:
            cls = jnp.asarray(np.stack([self._emb(p, (self.class_dim,)) for p in prompts]))
        if self.hidden_dim_1 is not None:
            hs1 = jnp.asarray(
                np.stack([self._emb(p, (self.seq_len_1, self.hidden_dim_1)) for p in prompts])
            )
            mask1 = jnp.ones((len(prompts), self.seq_len_1), dtype=jnp.int32)
        return TextCond(
            hidden_states=hs,
            class_labels=cls,
            attention_mask=mask,
            hidden_states_1=hs1,
            attention_mask_1=mask1,
        )


class ClapTextEncoder:
    """CLAP text branch: RoBERTa encoder + linear projection, L2-normalized
    (reference: models.py:511-537 — the AudioLDM FiLM conditioning vector).

    Requires converted weights; construct via models.registry when a
    checkpoint directory is supplied.
    """

    def __init__(self, flax_roberta, projection_params, tokenizer, max_length: int = 512):
        self.roberta = flax_roberta
        self.projection_params = projection_params
        self.tokenizer = tokenizer
        self.max_length = max_length

    def __call__(self, prompts: List[str], negative: bool = False) -> TextCond:
        toks = self.tokenizer(
            prompts,
            padding="max_length",
            max_length=self.max_length,
            truncation=True,
            return_tensors="np",
        )
        out = self.roberta(
            input_ids=toks["input_ids"], attention_mask=toks["attention_mask"]
        )
        pooled = out.last_hidden_state[:, 0]  # CLS pooling (CLAP text branch)
        w1, b1, w2, b2 = self.projection_params
        h = jnp.tanh(pooled @ w1 + b1) if w2 is not None else pooled @ w1 + b1
        emb = h @ w2 + b2 if w2 is not None else h
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return TextCond(class_labels=emb)


class T5TextEncoder:
    """FLAN-T5 encoder stream (TANGO / AudioLDM2 / Stable Audio text branch)."""

    def __init__(self, flax_t5, tokenizer, max_length: int = 512):
        self.t5 = flax_t5
        self.tokenizer = tokenizer
        self.max_length = max_length

    def __call__(self, prompts: List[str], negative: bool = False) -> TextCond:
        toks = self.tokenizer(
            prompts, padding="max_length", max_length=self.max_length,
            truncation=True, return_tensors="np",
        )
        out = self.t5(input_ids=toks["input_ids"], attention_mask=toks["attention_mask"])
        return TextCond(
            hidden_states=out.last_hidden_state,
            attention_mask=jnp.asarray(toks["attention_mask"]),
        )
