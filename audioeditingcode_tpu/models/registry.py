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


# (repr(module), rng bytes, arg shapes) -> params. Params are treated as
# immutable pytrees everywhere (flax functional style; sharding/loading
# REPLACE attributes rather than mutating arrays), so sharing the arrays
# across repeated loads of the same spec is safe. This mostly pays off in
# the test suite, which loads the tiny models hundreds of times.
_FAST_INIT_CACHE: dict = {}


def _fast_init(module, rng, init_args):
    """Materialize params from shapes only — no init forward compute.

    ``module.init`` executes the model's forward pass to run initializers;
    on one CPU that is minutes for a full-size UNet (init is also run when
    only a param TEMPLATE for ``from_bytes`` is needed). ``jax.eval_shape``
    traces the same init abstractly (zero FLOPs); leaves are then filled
    name/shape-aware — 'scale' ones, 'bias' zeros, >=2-D kernels
    lecun-normal by fan-in (flax's Dense/Conv default magnitude; smaller
    fixed scales leave tiny smoke models too linear for CFG scales to
    change the int16 output), other 1-D leaves N(0, 1) (Fourier/embedding
    projections). Real checkpoints overwrite every leaf; smoke mode only
    needs a non-degenerate random network, which this is.
    """
    key = (repr(module), np.asarray(rng).tobytes(),
           tuple((tuple(np.shape(a)), str(getattr(a, "dtype", type(a))))
                 for a in init_args if a is not None))
    cached = _FAST_INIT_CACHE.get(key)
    if cached is not None:
        return cached

    shapes = jax.eval_shape(lambda r: module.init(r, *init_args), rng)
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    # numpy PCG instead of jax threefry: unjitted threefry on one CPU core
    # generates ~185M UNet leaves in ~a minute; PCG does it in seconds.
    # Deterministic in (rng, leaf index).
    seed = [int(x) for x in np.asarray(rng).ravel()[:2]]

    def leaf(i, path, s):
        name = getattr(path[-1], "key", getattr(path[-1], "name", ""))
        if name == "scale":
            return jnp.ones(s.shape, s.dtype)
        if name == "bias":
            return jnp.zeros(s.shape, s.dtype)
        g = np.random.default_rng(seed + [i])
        std = (1.0 / np.sqrt(np.prod(s.shape[:-1]))) if len(s.shape) >= 2 else 1.0
        return jnp.asarray(
            std * g.standard_normal(s.shape, dtype=np.float32), s.dtype
        )

    params = jax.tree_util.tree_unflatten(
        treedef, [leaf(i, p, s) for i, (p, s) in enumerate(flat)]
    )
    # full-size real models are loaded once per process; caching them would
    # pin GBs — only memoize small (smoke/test) param sets
    if sum(int(np.prod(s.shape)) for _, s in flat) < 20_000_000:
        _FAST_INIT_CACHE[key] = params
    return params


def _load_or_init(module, rng, init_args, weights_dir, name):
    params = _fast_init(module, rng, init_args)
    if weights_dir is not None:
        path = os.path.join(weights_dir, f"{name}.msgpack")
        if os.path.exists(path):
            with open(path, "rb") as f:
                try:
                    params = serialization.from_bytes(params, f.read())
                except (ValueError, KeyError) as e:
                    # Structure mismatch — most likely a checkpoint converted
                    # before a module re-layout (e.g. the round-2 AudioLDM2
                    # per-stream Transformer2DModel change, PARITY.md).
                    raise ValueError(
                        f"{path} does not match the current {name!r} module "
                        f"structure. If it was converted with an older "
                        f"version of tools/convert_checkpoint.py (notably "
                        f"before the AudioLDM2 dual-stream re-layout), "
                        f"re-run the converter. Original error: {e}"
                    ) from e
        else:
            raise FileNotFoundError(f"missing converted weights: {path}")
    return params


def _dummy_cond_args(spec: ModelSpec):
    """Representative conditioning tensors for module init."""
    u = spec.unet
    hs = cls = hs1 = None
    if u.cross_attention_dim is not None:
        # any family with a real cross-attention stream (AudioLDM2 uses the
        # 8 GPT-2-generated tokens; TANGO/SD use the text sequence)
        seq = 8 if spec.family == "audioldm2" else max(spec.text_seq_len, 1)
        hs = jnp.ones((1, seq, u.cross_attention_dim))
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
):
    spec = resolve_spec(model_id)
    if spec.family == "stable-audio":
        return _load_stable_audio(spec, num_diffusion_steps, weights_dir, dtype, seed)
    sched = make_schedule(spec.scheduler, num_diffusion_steps)

    rngs = jax.random.split(jax.random.PRNGKey(seed), 3)
    unet = UNet2DConditionModel(spec.unet, dtype=dtype)
    if spec.vae.num_vq_embeddings > 0:
        from .vae import VQModel

        vae = VQModel(spec.vae, dtype=dtype)
    else:
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
        max_mel_frames=1700 if spec.family == "tango" else None,
    )


def _load_stable_audio(spec: ModelSpec, num_diffusion_steps: int,
                       weights_dir: Optional[str], dtype, seed: int):
    """Stable Audio family: DiT + Oobleck VAE + cosine DPM solver
    (reference wrapper: code/models.py:1051-1354)."""
    from ..editing.solvers import CosineDPMSolver
    from ..schedulers.cosine_dpm import make_cosine_dpm_schedule
    from .dit1d import StableAudioDiT, rotary_tables
    from .oobleck import AutoencoderOobleck
    from .pipeline1d import StableAudioPipeline
    from .projection import StableAudioProjectionModel

    solver = CosineDPMSolver(
        make_cosine_dpm_schedule(spec.cosine_scheduler, num_diffusion_steps)
    )
    rngs = jax.random.split(jax.random.PRNGKey(seed), 4)

    dit = StableAudioDiT(spec.dit, dtype=dtype)
    L = spec.dit.sample_size
    K = (spec.text_seq_len or 8) + 2  # text tokens + start/end duration embeds
    dit_params = _load_or_init(
        dit, rngs[0],
        (
            jnp.ones((1, L, spec.dit.in_channels)),
            jnp.ones((1,)) * 0.5,
            jnp.ones((1, K, spec.dit.cross_attention_input_dim)),
            jnp.ones((1, 1, spec.dit.global_states_input_dim)),
            rotary_tables(spec.dit.rotary_embed_dim, L + 1),
        ),
        weights_dir, "dit",
    )

    vae = AutoencoderOobleck(spec.oobleck, dtype=dtype)
    wave = jnp.ones((1, L * spec.oobleck.hop_length, spec.oobleck.audio_channels))
    vae_params = _load_or_init(
        vae, rngs[1], (wave, jax.random.PRNGKey(0)), weights_dir, "oobleck"
    )

    projection = StableAudioProjectionModel(spec.projection, dtype=dtype)
    projection_params = _init_projection_full(projection, rngs[2], spec, weights_dir)

    text_encoder = NullTextEncoder(
        hidden_dim=spec.projection.conditioning_dim,
        seq_len=spec.text_seq_len or 8,
    )
    if weights_dir is not None:
        text_encoder = _try_t5_projected(spec, weights_dir, projection,
                                         projection_params) or text_encoder

    pipe = StableAudioPipeline(
        model_id=spec.model_id,
        sched=solver,
        dit=dit,
        dit_params=dit_params,
        vae=vae,
        vae_params=vae_params,
        projection=projection,
        projection_params=projection_params,
        text_encoder=text_encoder,
        sample_rate=spec.sample_rate,
        sample_size=L,
    )
    # eager default-duration setup: the embeds must exist before any jitted
    # denoiser trace (lazy creation under trace would leak tracers)
    pipe.setup_duration()
    return pipe


def _init_projection_full(projection, rng, spec: ModelSpec,
                          weights_dir: Optional[str]):
    """Init ALL projection submodules (text proj + both number conditioners)."""
    params = projection.init(
        rng,
        jnp.ones((1, 1, spec.projection.text_encoder_dim)),
        jnp.ones((1,)),
        method=_projection_init_helper,
    )
    if weights_dir is not None:
        path = os.path.join(weights_dir, "projection.msgpack")
        if os.path.exists(path):
            with open(path, "rb") as f:
                params = serialization.from_bytes(params, f.read())
    return params


def _projection_init_helper(self, text_hs, secs):
    self.project_text(text_hs)
    self.encode_duration(secs, secs)
    return ()


def _try_t5_projected(spec, weights_dir, projection, projection_params):
    """T5 encoder + learned projection when transformers-Flax weights are
    available next to the converted checkpoint; None otherwise."""
    try:
        from transformers import AutoTokenizer, FlaxT5EncoderModel
    except ImportError:
        return None
    t5_dir = os.path.join(weights_dir, "t5")
    if not os.path.isdir(t5_dir):
        return None
    tok = AutoTokenizer.from_pretrained(t5_dir)
    t5 = FlaxT5EncoderModel.from_pretrained(t5_dir)
    from .text_encoders import T5TextEncoder, TextCond

    base = T5TextEncoder(t5, tok, max_length=spec.text_seq_len or 128)

    def encode(prompts, negative=False):
        cond = base(prompts, negative=negative)
        hs = cond.hidden_states
        if negative and cond.attention_mask is not None:
            hs = hs * cond.attention_mask[..., None].astype(hs.dtype)
        hs = projection.apply(projection_params, hs,
                              method=projection.project_text)
        return TextCond(hidden_states=hs, attention_mask=cond.attention_mask)

    return encode


def _make_text_encoder(spec: ModelSpec, weights_dir: Optional[str]):
    """Real encoders require converted weights; otherwise fall back to the
    deterministic NullTextEncoder (weight-free runs/benchmarks)."""
    unet = spec.unet
    if spec.family in ("audioldm",):
        # CLAP 512-d FiLM vector via class_labels (reference models.py:511-537)
        if weights_dir is not None:
            enc = _try_clap_film(weights_dir)
            if enc is not None:
                return enc
        return NullTextEncoder(
            class_dim=unet.projection_class_embeddings_input_dim,
        )
    if spec.family == "audioldm2":
        if weights_dir is not None:
            chain = _try_audioldm2_chain(spec, weights_dir)
            if chain is not None:
                return chain
        return NullTextEncoder(
            hidden_dim=unet.cross_attention_dim, seq_len=8,
            hidden_dim_1=unet.cross_attention_dim_1, seq_len_1=spec.text_seq_len or 8,
        )
    if spec.family == "tango":
        if weights_dir is not None:
            enc = _try_t5_encoder(spec, weights_dir)
            if enc is not None:
                return enc
        return NullTextEncoder(
            hidden_dim=unet.cross_attention_dim, seq_len=min(spec.text_seq_len, 64)
        )
    if spec.family == "stable-diffusion":
        if weights_dir is not None:
            enc = _try_clip_encoder(spec, weights_dir)
            if enc is not None:
                return enc
        return NullTextEncoder(
            hidden_dim=unet.cross_attention_dim, seq_len=min(spec.text_seq_len, 64)
        )
    if spec.family == "celebahq":
        return NullTextEncoder()
    # tiny/test
    return NullTextEncoder(class_dim=unet.projection_class_embeddings_input_dim)


def _try_clap_film(weights_dir: str):
    """AudioLDM CLAP text branch: RoBERTa + MLP projection, L2-normalized
    pooled vector used as FiLM conditioning (reference: models.py:511-537)."""
    clap_dir = os.path.join(weights_dir, "clap_text")
    if not os.path.isdir(clap_dir):
        return None
    try:
        from transformers import AutoTokenizer, FlaxRobertaModel
    except ImportError:
        return None
    from .text_encoders import TextCond

    roberta = FlaxRobertaModel.from_pretrained(clap_dir)
    tok = AutoTokenizer.from_pretrained(clap_dir)
    proj = np.load(os.path.join(clap_dir, "text_projection.npz"))

    def encode(prompts, negative=False):
        toks = tok(prompts, padding="max_length", max_length=tok.model_max_length,
                   truncation=True, return_tensors="np")
        out = roberta(input_ids=toks["input_ids"],
                      attention_mask=toks["attention_mask"])
        # ClapTextModelWithProjection projects the POOLER output
        # (tanh(dense(CLS)), transformers modeling_clap.py) — the reference
        # consumes text_encoder(...)[0] == text_embeds (models.py:533-537)
        pooled = out.pooler_output
        h = jnp.maximum(pooled @ proj["w1"].T + proj["b1"], 0.0)
        emb = h @ proj["w2"].T + proj["b2"]
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return TextCond(class_labels=emb)

    return encode


def _try_t5_encoder(spec: ModelSpec, weights_dir: str):
    """FLAN-T5 sequence conditioning (TANGO — reference models.py:415-441)."""
    t5_dir = os.path.join(weights_dir, "t5")
    if not os.path.isdir(t5_dir):
        return None
    try:
        from transformers import AutoTokenizer, FlaxT5EncoderModel
    except ImportError:
        return None
    from .text_encoders import T5TextEncoder

    return T5TextEncoder(
        FlaxT5EncoderModel.from_pretrained(t5_dir),
        AutoTokenizer.from_pretrained(t5_dir),
        max_length=min(spec.text_seq_len or 512, 512),
    )


def _try_clip_encoder(spec: ModelSpec, weights_dir: str):
    """CLIP text conditioning (Stable Diffusion — reference models.py:917-946)."""
    clip_dir = os.path.join(weights_dir, "clip")
    if not os.path.isdir(clip_dir):
        return None
    try:
        from transformers import AutoTokenizer, FlaxCLIPTextModel
    except ImportError:
        return None
    from .text_encoders import TextCond

    clip = FlaxCLIPTextModel.from_pretrained(clip_dir)
    tok = AutoTokenizer.from_pretrained(clip_dir)

    def encode(prompts, negative=False):
        toks = tok(prompts, padding="max_length", max_length=tok.model_max_length,
                   truncation=True, return_tensors="np")
        out = clip(input_ids=toks["input_ids"],
                   attention_mask=toks["attention_mask"])
        return TextCond(hidden_states=out.last_hidden_state)

    return encode


def _try_audioldm2_chain(spec: ModelSpec, weights_dir: str):
    """Full CLAP+T5+GPT2 conditioning chain from a converted checkpoint dir
    (reference: code/models.py:599-677). Layout expected from
    tools/convert_checkpoint.py:

      <weights_dir>/clap_text/   transformers-Flax RoBERTa + projection
      <weights_dir>/t5/          transformers-Flax T5 encoder + tokenizer
      <weights_dir>/gpt2.msgpack, projection_lm.msgpack

    Returns None (falling back to NullTextEncoder) when anything is missing.
    """
    from .audioldm2_cond import (
        AudioLDM2ProjectionConfig,
        AudioLDM2ProjectionModel,
        AudioLDM2TextEncoder,
        GPT2Config,
        GPT2Model,
    )

    gpt2_path = os.path.join(weights_dir, "gpt2.msgpack")
    proj_path = os.path.join(weights_dir, "projection_lm.msgpack")
    t5_dir = os.path.join(weights_dir, "t5")
    clap_dir = os.path.join(weights_dir, "clap_text")
    if not all(os.path.exists(p) for p in (gpt2_path, proj_path, t5_dir, clap_dir)):
        return None
    try:
        from transformers import AutoTokenizer, FlaxRobertaModel, FlaxT5EncoderModel
    except ImportError:
        return None

    roberta = FlaxRobertaModel.from_pretrained(clap_dir)
    clap_tok = AutoTokenizer.from_pretrained(clap_dir)
    clap_proj = np.load(os.path.join(clap_dir, "text_projection.npz"))
    t5 = FlaxT5EncoderModel.from_pretrained(t5_dir)
    t5_tok = AutoTokenizer.from_pretrained(t5_dir)

    def clap_text_features(prompts):
        toks = clap_tok(prompts, padding="max_length",
                        max_length=clap_tok.model_max_length,
                        truncation=True, return_tensors="np")
        out = roberta(input_ids=toks["input_ids"],
                      attention_mask=toks["attention_mask"])
        # ClapModel.get_text_features: projection of the POOLER output,
        # L2-normalized (transformers modeling_clap.py; reference
        # models.py:631-636 uses get_text_features)
        pooled = out.pooler_output
        h = jnp.maximum(pooled @ clap_proj["w1"].T + clap_proj["b1"], 0.0)
        emb = h @ clap_proj["w2"].T + clap_proj["b2"]
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return emb, jnp.asarray(toks["attention_mask"])

    def t5_features(prompts):
        toks = t5_tok(prompts, padding=True, truncation=True,
                      max_length=t5_tok.model_max_length, return_tensors="np")
        out = t5(input_ids=toks["input_ids"], attention_mask=toks["attention_mask"])
        return out.last_hidden_state, jnp.asarray(toks["attention_mask"])

    gpt2_cfg = spec.gpt2 or GPT2Config()
    proj_cfg = spec.projection_lm or AudioLDM2ProjectionConfig()
    gpt2 = GPT2Model(gpt2_cfg)
    g_init = gpt2.init(jax.random.PRNGKey(0),
                       jnp.ones((1, 4, gpt2_cfg.n_embd)), jnp.ones((1, 4)))
    with open(gpt2_path, "rb") as f:
        gpt2_params = serialization.from_bytes(g_init, f.read())

    projection = AudioLDM2ProjectionModel(proj_cfg)
    p_init = projection.init(jax.random.PRNGKey(0),
                             jnp.ones((1, 1, proj_cfg.text_encoder_dim)),
                             jnp.ones((1, 4, proj_cfg.text_encoder_1_dim)))
    with open(proj_path, "rb") as f:
        projection_params = serialization.from_bytes(p_init, f.read())

    from .audioldm2_cond import AudioLDM2TextEncoder

    return AudioLDM2TextEncoder(
        clap_text_features, t5_features, projection, projection_params,
        gpt2, gpt2_params,
    )


def save_params(params, path: str) -> None:
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))
