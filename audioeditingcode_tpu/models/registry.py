"""Model factory: model_id -> LatentAudioPipeline.

The JAX analogue of the reference's ``load_model`` substring dispatch
(code/models.py:1357-1374). Weights come from a converted-checkpoint
directory (``weights_dir``, written by tools/convert_checkpoint.py); without
one, modules are randomly initialized — sufficient for benchmarks, shape
tests and the multichip dry-run, clearly marked in the returned pipeline.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..ops.stft import MelConfig
from ..schedulers import make_schedule
from .configs import MODEL_SPECS, ModelSpec
from .hifigan import HifiGanGenerator
from .pipeline import LatentAudioPipeline
from .text_encoders import NullTextEncoder
from .unet2d import UNet2DConditionModel
from .vae import AutoencoderKL


def resolve_spec(model_id: str) -> ModelSpec:
    if model_id in MODEL_SPECS:
        return MODEL_SPECS[model_id]
    raise KeyError(
        f"unknown model_id {model_id!r}; known: {sorted(MODEL_SPECS)}"
    )


def _load_or_init(module, rng, init_args, weights_dir, name):
    params = module.init(rng, *init_args)
    if weights_dir is not None:
        path = os.path.join(weights_dir, f"{name}.msgpack")
        if os.path.exists(path):
            with open(path, "rb") as f:
                params = serialization.from_bytes(params, f.read())
        else:
            raise FileNotFoundError(f"missing converted weights: {path}")
    return params


def _dummy_cond_args(spec: ModelSpec):
    """Representative conditioning tensors for module init."""
    u = spec.unet
    hs = cls = hs1 = None
    if u.cross_attention_dim is not None or "CrossAttn" in u.down_block_types[0]:
        dim = u.cross_attention_dim or spec.text_embed_dim
        if spec.family == "audioldm" or spec.text_encoder in ("clap", "null"):
            hs = None
        else:
            hs = jnp.ones((1, max(spec.text_seq_len, 1), dim))
    if u.class_embed_type == "simple_projection":
        cls = jnp.ones((1, u.projection_class_embeddings_input_dim))
    if u.double_cross_attention:
        hs1 = jnp.ones((1, 1, u.cross_attention_dim_1))
    return hs, cls, hs1


def load_model(
    model_id: str,
    num_diffusion_steps: int,
    weights_dir: Optional[str] = None,
    dtype=jnp.float32,
    seed: int = 0,
    latent_time: int = 64,
) -> LatentAudioPipeline:
    spec = resolve_spec(model_id)
    sched = make_schedule(spec.scheduler, num_diffusion_steps)

    rngs = jax.random.split(jax.random.PRNGKey(seed), 3)
    unet = UNet2DConditionModel(spec.unet, dtype=dtype)
    vae = AutoencoderKL(spec.vae, dtype=dtype)

    lat_w = (spec.mel.n_mel_channels if spec.mel else 64) // spec.vae.downscale_factor
    x_lat = jnp.ones((1, latent_time, lat_w, spec.unet.in_channels))
    hs, cls, hs1 = _dummy_cond_args(spec)
    unet_params = _load_or_init(
        unet, rngs[0], (x_lat, jnp.array([1]), hs, cls, None, hs1), weights_dir, "unet"
    )

    img_h = latent_time * spec.vae.downscale_factor
    img_w = spec.mel.n_mel_channels if spec.mel else 64
    x_img = jnp.ones((1, img_h, img_w, spec.vae.in_channels))
    vae_params = _load_or_init(vae, rngs[1], (x_img,), weights_dir, "vae")

    vocoder = vocoder_params = None
    if spec.vocoder is not None:
        vocoder = HifiGanGenerator(spec.vocoder, dtype=dtype)
        mel_in = jnp.ones((1, 32, spec.vocoder.model_in_dim))
        vocoder_params = _load_or_init(vocoder, rngs[2], (mel_in,), weights_dir, "vocoder")

    text_encoder = _make_text_encoder(spec, weights_dir)

    return LatentAudioPipeline(
        model_id=model_id,
        sched=sched,
        unet=unet,
        unet_params=unet_params,
        vae=vae,
        vae_params=vae_params,
        vocoder=vocoder,
        vocoder_params=vocoder_params,
        text_encoder=text_encoder,
        mel_config=spec.mel or MelConfig(),
        sample_rate=spec.sample_rate,
        vae_pad_multiple=spec.vae.downscale_factor,
    )


def _make_text_encoder(spec: ModelSpec, weights_dir: Optional[str]):
    """Real encoders require converted weights; otherwise fall back to the
    deterministic NullTextEncoder (weight-free runs/benchmarks)."""
    unet = spec.unet
    if spec.family in ("audioldm",):
        # CLAP 512-d FiLM vector via class_labels (reference models.py:511-537)
        return NullTextEncoder(
            class_dim=unet.projection_class_embeddings_input_dim,
        )
    if spec.family == "audioldm2":
        return NullTextEncoder(
            hidden_dim=unet.cross_attention_dim, seq_len=8,
            hidden_dim_1=unet.cross_attention_dim_1, seq_len_1=spec.text_seq_len or 8,
        )
    if spec.family in ("tango", "stable-diffusion"):
        return NullTextEncoder(
            hidden_dim=unet.cross_attention_dim, seq_len=min(spec.text_seq_len, 64)
        )
    if spec.family == "celebahq":
        return NullTextEncoder()
    # tiny/test
    return NullTextEncoder(class_dim=unet.projection_class_embeddings_input_dim)


def save_params(params, path: str) -> None:
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))
