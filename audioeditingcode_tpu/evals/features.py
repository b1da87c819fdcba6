"""Pluggable audio/text feature extractors for the eval tower.

The reference binds its metrics to LAION-CLAP's HTSAT audio tower
(evals/pretrained_networks.py:12-168 — mel frontend, 4 swin stages, embed
head). Here the extractor is a protocol so metrics are network-agnostic:

  stages(aud, sr)  -> list of (1, C_i, H_i, W_i)-like stage features (LPAPS)
  embed_audio(...) -> (D,) audio embedding          (CLAP consistency, FAD)
  embed_text(...)  -> (N, D) text embeddings        (CLAP consistency)

``TransformersClapExtractor`` is the oracle (torch-CPU CLAP from the
``transformers`` package; weights via local path or HF id).
``MelStageExtractor`` is a weight-free, deterministic JAX stand-in with the
same interface for offline tests.
"""

from __future__ import annotations

import hashlib
import warnings
from typing import List, Optional, Sequence

import numpy as np

from ..ops.stft import MelConfig, mel_spectrogram
from ..utils.audio_io import resample

# The reference pins LPAPS and CLAP-consistency to LAION-CLAP HTSAT-base with
# the music_speech_epoch_15_esc_89.25.pt checkpoint
# (reference evals/lpaps.py:27-29, evals/pretrained_networks.py:12-30); its
# transformers port is laion/larger_clap_music_and_speech. Every extractor
# and the eval CLI default to this id so scores produced without flags are
# protocol-comparable with the paper.
LPAPS_CLAP_MUSIC_SPEECH = "laion/larger_clap_music_and_speech"


class MelStageExtractor:
    """Weight-free extractor: log-mel pyramid stages + pooled-stats embeds.

    Deterministic, no checkpoints needed — stands in for CLAP wherever the
    metric *machinery* (windowing, normalization, aggregation, checkpoints)
    is under test. NOT a perceptual model.
    """

    sample_rate = 48000
    embed_dim = 64
    # CLAP-processor parity: every extractor here pads/truncates each input
    # to a fixed 10 s window before featurizing (HF ClapProcessor does the
    # same), so features never see audio past this. FADScorer warns when
    # configured with a longer window.
    input_window_s = 10.0

    def __init__(self, n_mels: int = 64):
        self.config = MelConfig(
            filter_length=1024, hop_length=480, win_length=1024,
            n_mel_channels=n_mels, sampling_rate=self.sample_rate,
            mel_fmin=0.0, mel_fmax=24000.0,
        )

    def _mel(self, aud: np.ndarray, sr: int) -> np.ndarray:
        import jax.numpy as jnp

        aud = np.atleast_2d(np.asarray(aud, np.float32))
        if aud.shape[0] > 1:
            aud = aud.mean(axis=0, keepdims=True)
        aud = resample(aud, sr, self.sample_rate)
        # CLAP's processor pads/truncates every input to a fixed 10 s
        # window, so stage features are length-independent; mirror that so
        # LPAPS between different-length clips is well-defined here too.
        n = int(self.input_window_s * self.sample_rate)
        if aud.shape[-1] < n:
            aud = np.pad(aud, ((0, 0), (0, n - aud.shape[-1])))
        else:
            aud = aud[..., :n]
        log_mel, _, _ = mel_spectrogram(jnp.asarray(aud), self.config)
        return np.asarray(log_mel)  # (1, n_mels, T)

    def stages(self, aud: np.ndarray, sr: int) -> List[np.ndarray]:
        m = self._mel(aud, sr)[:, None]  # (1, 1, n_mels, T)
        stages = []
        for _ in range(4):
            stages.append(m)
            if m.shape[-1] >= 2 and m.shape[-2] >= 2:
                m = m[..., : m.shape[-2] // 2 * 2, : m.shape[-1] // 2 * 2]
                m = 0.25 * (m[..., ::2, ::2] + m[..., 1::2, ::2]
                            + m[..., ::2, 1::2] + m[..., 1::2, 1::2])
        return stages

    def embed_audio(self, aud: np.ndarray, sr: int) -> np.ndarray:
        m = self._mel(aud, sr)[0]  # (n_mels, T)
        feats = np.concatenate([m.mean(axis=1), m.std(axis=1) + 1e-6])[: self.embed_dim * 2]
        v = feats[: self.embed_dim] / (np.linalg.norm(feats[: self.embed_dim]) + 1e-8)
        return v.astype(np.float32)

    def embed_text(self, texts: Sequence[str]) -> np.ndarray:
        out = []
        for t in texts:
            seed = int.from_bytes(hashlib.sha256(t.encode()).digest()[:4], "little")
            v = np.random.default_rng(seed).standard_normal(self.embed_dim)
            out.append(v / np.linalg.norm(v))
        return np.stack(out).astype(np.float32)


def _clap_prep(processor, aud: np.ndarray, sr: int, sample_rate: int):
    """Shared CLAP audio prep: mono downmix, resample to the model rate,
    processor mel features (reference convert_audio semantics,
    evals/meta_clap_consistency.py:64-69)."""
    aud = np.atleast_2d(np.asarray(aud, np.float32))
    if aud.shape[0] > 1:
        aud = aud.mean(axis=0, keepdims=True)
    aud = resample(aud, sr, sample_rate)[0]
    return processor(audios=aud, sampling_rate=sample_rate,
                     return_tensors="pt")


class TransformersClapExtractor:
    """Oracle extractor on torch-CPU CLAP (transformers ClapModel).

    Mirrors the reference's CLAP usage: 48 kHz mono input
    (evals/meta_clap_consistency.py:64-69 convert_audio), audio-tower stage
    features for LPAPS (evals/pretrained_networks.py:114-127), pooled
    projected embeddings for consistency/FAD.
    """

    sample_rate = 48000
    input_window_s = 10.0  # ClapProcessor pads/truncates to 10 s

    def __init__(self, model_name_or_path: str = LPAPS_CLAP_MUSIC_SPEECH,
                 local_files_only: bool = True):
        from transformers import AutoProcessor, ClapModel

        model = ClapModel.from_pretrained(
            model_name_or_path, local_files_only=local_files_only
        )
        processor = AutoProcessor.from_pretrained(
            model_name_or_path, local_files_only=local_files_only
        )
        self._init_components(model, processor)

    @classmethod
    def from_components(cls, model, processor):
        """Construct from in-memory model/processor (tests, custom configs)."""
        self = cls.__new__(cls)
        self._init_components(model, processor)
        return self

    def _init_components(self, model, processor):
        import torch

        self.torch = torch
        self.model = model.eval()
        self.processor = processor
        self.embed_dim = self.model.config.projection_dim

    def _prep(self, aud: np.ndarray, sr: int):
        return _clap_prep(self.processor, aud, sr, self.sample_rate)

    def stages(self, aud: np.ndarray, sr: int) -> List[np.ndarray]:
        inputs = self._prep(aud, sr)
        with self.torch.no_grad():
            out = self.model.audio_model(
                inputs["input_features"], output_hidden_states=True
            )
        # swin stage outputs (reference uses stages 1-4 of HTSAT,
        # pretrained_networks.py:114-127)
        hs = out.hidden_states if out.hidden_states is not None else [out.last_hidden_state]
        return [h.numpy() for h in hs[-4:]]

    def embed_audio(self, aud: np.ndarray, sr: int) -> np.ndarray:
        inputs = self._prep(aud, sr)
        with self.torch.no_grad():
            emb = self.model.get_audio_features(**inputs)
        v = emb[0].numpy()
        return (v / (np.linalg.norm(v) + 1e-8)).astype(np.float32)

    def embed_text(self, texts: Sequence[str]) -> np.ndarray:
        with self.torch.no_grad():
            toks = self.processor(text=list(texts), return_tensors="pt", padding=True)
            emb = self.model.get_text_features(**toks).numpy()
        return (emb / (np.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)).astype(
            np.float32
        )


class FlaxClapExtractor:
    """CLAP on JAX/TPU: audio tower (models/clap_audio.py) AND text tower
    (models/clap_text.py), both torch-parity tested; torch is only used to
    read the checkpoint at load time. Same extractor protocol and outputs
    as the oracle."""

    sample_rate = 48000
    input_window_s = 10.0  # ClapProcessor pads/truncates to 10 s

    def __init__(self, model_name_or_path: str = LPAPS_CLAP_MUSIC_SPEECH,
                 local_files_only: bool = True):
        from transformers import AutoProcessor, ClapModel

        model = ClapModel.from_pretrained(
            model_name_or_path, local_files_only=local_files_only
        )
        processor = AutoProcessor.from_pretrained(
            model_name_or_path, local_files_only=local_files_only
        )
        self._init_components(model, processor)

    @classmethod
    def from_components(cls, model, processor):
        self = cls.__new__(cls)
        self._init_components(model, processor)
        return self

    def _init_components(self, model, processor):
        import functools

        import jax

        from ..models.clap_audio import (
            clap_audio_embed,
            clap_audio_forward,
            params_from_torch_clap,
        )
        from ..models.clap_text import (
            clap_text_embed,
            clap_text_forward,
            text_params_from_torch_clap,
        )

        self.processor = processor
        self.params, self.cfg = params_from_torch_clap(model)
        self.text_params, self.text_cfg = text_params_from_torch_clap(model)
        self.embed_dim = self.cfg.projection_dim
        self._fwd = jax.jit(
            functools.partial(clap_audio_forward, cfg=self.cfg))
        self._proj = jax.jit(clap_audio_embed)
        self._text_fwd = jax.jit(
            functools.partial(clap_text_forward, cfg=self.text_cfg))
        self._text_proj = jax.jit(clap_text_embed)

    def _prep(self, aud: np.ndarray, sr: int) -> np.ndarray:
        feats = _clap_prep(self.processor, aud, sr, self.sample_rate)
        return np.asarray(feats["input_features"], np.float32)

    def stages(self, aud: np.ndarray, sr: int) -> List[np.ndarray]:
        stages, _ = self._fwd(self.params, self._prep(aud, sr))
        return [np.asarray(s) for s in stages[-4:]]

    def embed_audio(self, aud: np.ndarray, sr: int) -> np.ndarray:
        _, pooled = self._fwd(self.params, self._prep(aud, sr))
        v = np.asarray(self._proj(self.params, pooled))[0]
        return (v / (np.linalg.norm(v) + 1e-8)).astype(np.float32)

    def embed_text(self, texts: Sequence[str]) -> np.ndarray:
        toks = self.processor(text=list(texts), return_tensors="pt", padding=True)
        ids = np.asarray(toks["input_ids"])
        mask = np.asarray(toks["attention_mask"])
        pooled = self._text_fwd(self.text_params, ids, mask)
        emb = np.asarray(self._text_proj(self.text_params, pooled))
        return (emb / (np.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)).astype(
            np.float32
        )


# fadtk's 'clap-laion-music' model = laion_clap HTSAT-base with the
# music_audioset_epoch_15_esc_90.14.pt checkpoint; its transformers port is
# laion/larger_clap_music. Binding FAD to this checkpoint keeps scores
# protocol-comparable with the reference (evals/fadtk_utils.py:33-59,
# UnsupEval.ipynb cells 7-12): 48 kHz mono, 10 s / 10%-overlap windows,
# L2-normalized 512-d projected audio embeddings (laion_clap
# get_audio_embedding normalizes; transformers get_audio_features output is
# normalized by the extractor).
FAD_CLAP_MUSIC = "laion/larger_clap_music"


def default_extractor(model_name_or_path: Optional[str] = None,
                      backend: str = "jax",
                      allow_mel_fallback: bool = False):
    """CLAP extractor bound to the reference LPAPS/consistency protocol.

    Defaults to ``LPAPS_CLAP_MUSIC_SPEECH`` (the transformers port of the
    reference's ``music_speech_epoch_15_esc_89.25.pt`` — reference
    evals/lpaps.py:27-29). JAX audio tower by default, torch oracle with
    ``backend='torch'``. If the checkpoint is unreachable this is a HARD
    ERROR unless ``allow_mel_fallback=True`` explicitly opts in to the
    weight-free, NON-perceptual ``MelStageExtractor`` — scores from the
    fallback look like real metric CSVs but are not comparable to the
    paper protocol.
    """
    target = model_name_or_path or LPAPS_CLAP_MUSIC_SPEECH
    try:
        if backend == "jax":
            return FlaxClapExtractor(target)
        return TransformersClapExtractor(target)
    except Exception as e:  # missing weights / offline
        if not allow_mel_fallback:
            raise RuntimeError(
                f"CLAP checkpoint '{target}' is unavailable ({e}). Scores "
                "need the reference protocol checkpoint "
                f"({LPAPS_CLAP_MUSIC_SPEECH}); pass allow_mel_fallback=True "
                "(CLI: --allow_mel_fallback) to knowingly use the "
                "weight-free, non-perceptual MelStageExtractor instead."
            ) from e
        warnings.warn(
            f"[evals] CLAP unavailable ({e}); using MelStageExtractor — "
            "scores are NOT protocol-comparable (non-perceptual features)")
    return MelStageExtractor()


def fad_extractor(model_name_or_path: Optional[str] = None,
                  backend: str = "jax",
                  allow_mel_fallback: bool = False):
    """FAD-protocol extractor: defaults to the laion-CLAP MUSIC checkpoint
    convention (fadtk 'clap-laion-music'); same hard-error/opt-in-fallback
    contract as :func:`default_extractor`."""
    return default_extractor(model_name_or_path or FAD_CLAP_MUSIC, backend,
                             allow_mel_fallback=allow_mel_fallback)
