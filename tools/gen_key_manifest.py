#!/usr/bin/env python
"""Generate pinned state-dict key manifests for every real checkpoint the
converter supports (VERDICT r2 #4: converter fidelity must not rest only on
the hand-written parity oracles).

Each manifest is a text file ``data/key_manifests/<model_slug>/<component>.txt``
of ``<torch key>\t<comma shapes>`` lines describing the EXACT state dict the
real HF checkpoint subfolder contains. tests/test_key_manifests.py builds a
synthetic state dict from each manifest and pushes it through the converter
with STRICT accounting — any drift between the manifests, the converter's
layout rules, and the Flax modules fails the suite.

Provenance (two independent sources, deliberately NOT the converter):
- vocoder (transformers SpeechT5HifiGan) and language_model (transformers
  GPT2Model): instantiated on the torch meta device from the real configs —
  authoritative key sets straight from the library that defines them.
- unet / vae / vqvae / transformer / oobleck / projection_model: generated
  from an independent encoding of diffusers' naming grammar + channel
  arithmetic (UNet2DConditionModel / AudioLDM2UNet2DConditionModel /
  AutoencoderKL / VQModel / StableAudioDiTModel / AutoencoderOobleck /
  StableAudioProjectionModel / AudioLDM2ProjectionModel as of diffusers
  v0.27-v0.30), with geometry taken from models/configs.py (which mirrors
  each checkpoint's config.json; reference loads them at runtime,
  code/models.py:478,556,1055).

Caveats recorded here once: manifests use the MODERN canonical key style —
VAE mid attentions as to_q/to_k/to_v/to_out.0 (diffusers remaps legacy
query/key/value at load), weight-normed convs as weight_g/weight_v pairs
(torch legacy weight_norm; fold_weight_norm also accepts the
parametrizations.* style), and GPT-2 without the non-persistent attn.bias
buffers (the converter skips them when an older dump has them). The
text_encoder/t5/clip/clap subfolders are NOT manifested: their conversion is
delegated to transformers' own from_pt loaders, not to our key mapping.
"""

from __future__ import annotations

import os
import sys
from typing import Iterator, Tuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Item = Tuple[str, Tuple[int, ...]]

# --------------------------------------------------------------- helpers


def _linear(prefix: str, cout: int, cin: int, bias: bool = True) -> Iterator[Item]:
    yield f"{prefix}.weight", (cout, cin)
    if bias:
        yield f"{prefix}.bias", (cout,)


def _conv2d(prefix: str, cout: int, cin: int, k: int, bias: bool = True) -> Iterator[Item]:
    yield f"{prefix}.weight", (cout, cin, k, k)
    if bias:
        yield f"{prefix}.bias", (cout,)


def _norm(prefix: str, c: int) -> Iterator[Item]:
    yield f"{prefix}.weight", (c,)
    yield f"{prefix}.bias", (c,)


# ------------------------------------------------- UNet2DConditionModel


def _resnet2d(prefix: str, cin: int, cout: int, temb_ch) -> Iterator[Item]:
    """diffusers.models.resnet.ResnetBlock2D (conv_shortcut on channel change)."""
    yield from _norm(f"{prefix}.norm1", cin)
    yield from _conv2d(f"{prefix}.conv1", cout, cin, 3)
    if temb_ch:
        yield from _linear(f"{prefix}.time_emb_proj", cout, temb_ch)
    yield from _norm(f"{prefix}.norm2", cout)
    yield from _conv2d(f"{prefix}.conv2", cout, cout, 3)
    if cin != cout:
        yield from _conv2d(f"{prefix}.conv_shortcut", cout, cin, 1)


def _attention(prefix: str, dim: int, cross) -> Iterator[Item]:
    """diffusers Attention: biasless q/k/v, to_out.0 with bias."""
    yield f"{prefix}.to_q.weight", (dim, dim)
    yield f"{prefix}.to_k.weight", (dim, cross or dim)
    yield f"{prefix}.to_v.weight", (dim, cross or dim)
    yield from _linear(f"{prefix}.to_out.0", dim, dim)


def _transformer2d(prefix: str, c: int, cross, linear_proj: bool) -> Iterator[Item]:
    """diffusers Transformer2DModel, num_layers=1, inner_dim == in_channels."""
    inner = c
    yield from _norm(f"{prefix}.norm", c)  # GroupNorm(32, c)
    if linear_proj:
        yield from _linear(f"{prefix}.proj_in", inner, c)
    else:
        yield from _conv2d(f"{prefix}.proj_in", inner, c, 1)
    tb = f"{prefix}.transformer_blocks.0"
    yield from _norm(f"{tb}.norm1", inner)
    yield from _attention(f"{tb}.attn1", inner, None)
    yield from _norm(f"{tb}.norm2", inner)
    yield from _attention(f"{tb}.attn2", inner, cross)
    yield from _norm(f"{tb}.norm3", inner)
    # GEGLU FF: net.0.proj doubles the 4x inner dim
    yield from _linear(f"{tb}.ff.net.0.proj", inner * 8, inner)
    yield from _linear(f"{tb}.ff.net.2", inner, inner * 4)
    if linear_proj:
        yield from _linear(f"{prefix}.proj_out", c, inner)
    else:
        yield from _conv2d(f"{prefix}.proj_out", c, inner, 1)


def unet_manifest(cfg) -> Iterator[Item]:
    """UNet2DConditionModel / AudioLDM2UNet2DConditionModel state dict.

    Channel bookkeeping follows diffusers unet_2d_condition.py: skip channels
    on the up path are input_channel for the last resnet of a block, else
    output_channel; the dual-stream variant interleaves one full
    Transformer2DModel per conditioning stream at attentions.{2j}/{2j+1}.
    """
    bo = cfg.block_out_channels
    ted = bo[0] * 4
    temb_ch = ted * 2 if cfg.class_embeddings_concat else ted

    def attn_layers(prefix: str, j: int, c: int) -> Iterator[Item]:
        if cfg.double_cross_attention:
            yield from _transformer2d(f"{prefix}.{2 * j}", c,
                                      cfg.cross_attention_dim,
                                      cfg.use_linear_projection)
            yield from _transformer2d(f"{prefix}.{2 * j + 1}", c,
                                      cfg.cross_attention_dim_1,
                                      cfg.use_linear_projection)
        else:
            yield from _transformer2d(f"{prefix}.{j}", c,
                                      cfg.cross_attention_dim,
                                      cfg.use_linear_projection)

    yield from _conv2d("conv_in", bo[0], cfg.in_channels, 3)
    yield from _linear("time_embedding.linear_1", ted, bo[0])
    yield from _linear("time_embedding.linear_2", ted, ted)
    if cfg.class_embed_type == "simple_projection":
        yield from _linear("class_embedding", ted,
                           cfg.projection_class_embeddings_input_dim)

    prev = bo[0]
    for i, bt in enumerate(cfg.down_block_types):
        out = bo[i]
        for j in range(cfg.layers_per_block):
            yield from _resnet2d(f"down_blocks.{i}.resnets.{j}",
                                 prev if j == 0 else out, out, temb_ch)
            if bt == "CrossAttnDownBlock2D":
                yield from attn_layers(f"down_blocks.{i}.attentions", j, out)
        if i < len(bo) - 1:
            yield from _conv2d(f"down_blocks.{i}.downsamplers.0.conv", out, out, 3)
        prev = out

    if cfg.mid_block_type is not None:
        mid = bo[-1]
        yield from _resnet2d("mid_block.resnets.0", mid, mid, temb_ch)
        yield from attn_layers("mid_block.attentions", 0, mid)
        yield from _resnet2d("mid_block.resnets.1", mid, mid, temb_ch)

    rev = tuple(reversed(bo))
    prev = rev[0]
    for i, bt in enumerate(cfg.up_block_types):
        out = rev[i]
        inp = rev[min(i + 1, len(bo) - 1)]
        n_res = cfg.layers_per_block + 1
        for j in range(n_res):
            skip_ch = inp if j == n_res - 1 else out
            res_in = (prev if j == 0 else out) + skip_ch
            yield from _resnet2d(f"up_blocks.{i}.resnets.{j}", res_in, out, temb_ch)
            if bt == "CrossAttnUpBlock2D":
                yield from attn_layers(f"up_blocks.{i}.attentions", j, out)
        if i < len(bo) - 1:
            yield from _conv2d(f"up_blocks.{i}.upsamplers.0.conv", out, out, 3)
        prev = out

    yield from _norm("conv_norm_out", bo[0])
    yield from _conv2d("conv_out", cfg.out_channels, bo[0], 3)


# -------------------------------------------------- AutoencoderKL / VQModel


def _vae_mid(prefix: str, c: int) -> Iterator[Item]:
    yield from _resnet2d(f"{prefix}.resnets.0", c, c, None)
    a = f"{prefix}.attentions.0"
    yield from _norm(f"{a}.group_norm", c)
    for n in ("to_q", "to_k", "to_v"):
        yield from _linear(f"{a}.{n}", c, c)
    yield from _linear(f"{a}.to_out.0", c, c)
    yield from _resnet2d(f"{prefix}.resnets.1", c, c, None)


def vae_manifest(cfg) -> Iterator[Item]:
    """diffusers AutoencoderKL (or VQModel when cfg.num_vq_embeddings > 0)."""
    bo = cfg.block_out_channels
    vq = cfg.num_vq_embeddings > 0
    lat = cfg.latent_channels

    yield from _conv2d("encoder.conv_in", bo[0], cfg.in_channels, 3)
    prev = bo[0]
    for i, out in enumerate(bo):
        for j in range(cfg.layers_per_block):
            yield from _resnet2d(f"encoder.down_blocks.{i}.resnets.{j}",
                                 prev if j == 0 else out, out, None)
        if i < len(bo) - 1:
            yield from _conv2d(f"encoder.down_blocks.{i}.downsamplers.0.conv",
                               out, out, 3)
        prev = out
    yield from _vae_mid("encoder.mid_block", bo[-1])
    yield from _norm("encoder.conv_norm_out", bo[-1])
    enc_out = lat if vq or not cfg.double_z else 2 * lat
    yield from _conv2d("encoder.conv_out", enc_out, bo[-1], 3)

    if vq:
        yield from _conv2d("quant_conv", lat, lat, 1)
        yield "quantize.embedding.weight", (cfg.num_vq_embeddings, lat)
        yield from _conv2d("post_quant_conv", lat, lat, 1)
    else:
        yield from _conv2d("quant_conv", 2 * lat, 2 * lat, 1)
        yield from _conv2d("post_quant_conv", lat, lat, 1)

    rev = tuple(reversed(bo))
    yield from _conv2d("decoder.conv_in", rev[0], lat, 3)
    yield from _vae_mid("decoder.mid_block", rev[0])
    prev = rev[0]
    for i, out in enumerate(rev):
        for j in range(cfg.layers_per_block + 1):
            yield from _resnet2d(f"decoder.up_blocks.{i}.resnets.{j}",
                                 prev if j == 0 else out, out, None)
        if i < len(rev) - 1:
            yield from _conv2d(f"decoder.up_blocks.{i}.upsamplers.0.conv",
                               out, out, 3)
        prev = out
    yield from _norm("decoder.conv_norm_out", rev[-1])
    yield from _conv2d("decoder.conv_out", cfg.out_channels, rev[-1], 3)


# ------------------------------------------------------ StableAudio DiT


def dit_manifest(cfg) -> Iterator[Item]:
    """diffusers StableAudioDiTModel state dict (stable_audio_transformer.py)."""
    inner = cfg.inner_dim
    kv_inner = cfg.num_key_value_attention_heads * cfg.attention_head_dim

    yield "time_proj.weight", (cfg.time_proj_dim // 2,)
    # timestep_proj = Sequential(Linear, SiLU, Linear) with biases
    yield from _linear("timestep_proj.0", inner, cfg.time_proj_dim)
    yield from _linear("timestep_proj.2", inner, inner)
    yield from _linear("global_proj.0", inner, cfg.global_states_input_dim, bias=False)
    yield from _linear("global_proj.2", inner, inner, bias=False)
    yield from _linear("cross_attention_proj.0", cfg.cross_attention_dim,
                       cfg.cross_attention_input_dim, bias=False)
    yield from _linear("cross_attention_proj.2", cfg.cross_attention_dim,
                       cfg.cross_attention_dim, bias=False)

    yield "preprocess_conv.weight", (cfg.in_channels, cfg.in_channels, 1)
    yield "proj_in.weight", (inner, cfg.in_channels)

    for i in range(cfg.num_layers):
        tb = f"transformer_blocks.{i}"
        yield from _norm(f"{tb}.norm1", inner)
        yield f"{tb}.attn1.to_q.weight", (inner, inner)
        yield f"{tb}.attn1.to_k.weight", (kv_inner, inner)
        yield f"{tb}.attn1.to_v.weight", (kv_inner, inner)
        yield f"{tb}.attn1.to_out.0.weight", (inner, inner)
        yield from _norm(f"{tb}.norm2", inner)
        yield f"{tb}.attn2.to_q.weight", (inner, inner)
        yield f"{tb}.attn2.to_k.weight", (kv_inner, cfg.cross_attention_dim)
        yield f"{tb}.attn2.to_v.weight", (kv_inner, cfg.cross_attention_dim)
        yield f"{tb}.attn2.to_out.0.weight", (inner, inner)
        yield from _norm(f"{tb}.norm3", inner)
        yield from _linear(f"{tb}.ff.net.0.proj", inner * 8, inner)
        yield from _linear(f"{tb}.ff.net.2", inner, inner * 4)

    yield "proj_out.weight", (cfg.out_channels, inner)
    yield "postprocess_conv.weight", (cfg.out_channels, cfg.out_channels, 1)


# ------------------------------------------------------ Oobleck VAE


def _wn_conv1d(prefix: str, cout: int, cin: int, k: int,
               bias: bool = True, transpose: bool = False) -> Iterator[Item]:
    """Weight-normed Conv1d/ConvTranspose1d (legacy weight_g/weight_v pair)."""
    lead = cin if transpose else cout
    yield f"{prefix}.weight_g", (lead, 1, 1)
    yield f"{prefix}.weight_v", ((cin, cout, k) if transpose else (cout, cin, k))
    if bias:
        yield f"{prefix}.bias", (cout,)


def _snake(prefix: str, c: int) -> Iterator[Item]:
    yield f"{prefix}.alpha", (1, c, 1)
    yield f"{prefix}.beta", (1, c, 1)


def _oobleck_res_unit(prefix: str, c: int) -> Iterator[Item]:
    yield from _snake(f"{prefix}.snake1", c)
    yield from _wn_conv1d(f"{prefix}.conv1", c, c, 7)
    yield from _snake(f"{prefix}.snake2", c)
    yield from _wn_conv1d(f"{prefix}.conv2", c, c, 1)


def oobleck_manifest(cfg) -> Iterator[Item]:
    """diffusers AutoencoderOobleck (autoencoder_oobleck.py) state dict."""
    c = cfg.encoder_hidden_size
    yield from _wn_conv1d("encoder.conv1", c, cfg.audio_channels, 7)
    mult = 1
    for i, stride in enumerate(cfg.downsampling_ratios):
        out_m = cfg.channel_multiples[i]
        b = f"encoder.block.{i}"
        for r in range(3):
            yield from _oobleck_res_unit(f"{b}.res_unit{r + 1}", c * mult)
        yield from _snake(f"{b}.snake1", c * mult)
        yield from _wn_conv1d(f"{b}.conv1", c * out_m, c * mult, 2 * stride)
        mult = out_m
    yield from _snake("encoder.snake1", c * mult)
    yield from _wn_conv1d("encoder.conv2", 2 * cfg.decoder_input_channels,
                          c * mult, 3)

    d = cfg.decoder_channels
    mults = cfg.channel_multiples
    yield from _wn_conv1d("decoder.conv1", d * mults[-1],
                          cfg.decoder_input_channels, 7)
    strides = cfg.downsampling_ratios[::-1]
    rev_mults = (1,) + tuple(mults)
    for i, stride in enumerate(strides):
        in_c = d * rev_mults[len(strides) - i]
        out_c = d * rev_mults[len(strides) - i - 1]
        b = f"decoder.block.{i}"
        yield from _snake(f"{b}.snake1", in_c)
        yield from _wn_conv1d(f"{b}.conv_t1", out_c, in_c, 2 * stride,
                              transpose=True)
        for r in range(3):
            yield from _oobleck_res_unit(f"{b}.res_unit{r + 1}", out_c)
    yield from _snake("decoder.snake1", d)
    yield from _wn_conv1d("decoder.conv2", cfg.audio_channels, d, 7, bias=False)


# --------------------------------------------------------- projections


def projection_sa_manifest(cfg) -> Iterator[Item]:
    """diffusers StableAudioProjectionModel (biasless text Sequential +
    two NumberConditioners: fourier 'weights' + Linear(internal_dim+1))."""
    yield from _linear("text_projection.0", cfg.conditioning_dim,
                       cfg.text_encoder_dim, bias=False)
    yield from _linear("text_projection.2", cfg.conditioning_dim,
                       cfg.conditioning_dim, bias=False)
    for side in ("start", "end"):
        p = f"{side}_number_conditioner.time_positional_embedding"
        yield f"{p}.0.weights", (cfg.internal_dim // 2,)
        yield from _linear(f"{p}.1", cfg.conditioning_dim, cfg.internal_dim + 1)


def projection_lm_manifest(cfg) -> Iterator[Item]:
    """diffusers AudioLDM2ProjectionModel."""
    d = cfg.langauge_model_dim
    yield from _linear("projection", d, cfg.text_encoder_dim)
    yield from _linear("projection_1", d, cfg.text_encoder_1_dim)
    for k in ("sos_embed", "eos_embed", "sos_embed_1", "eos_embed_1"):
        yield k, (d,)


# ----------------------------------------- transformers-backed components


def hifigan_manifest(cfg) -> Iterator[Item]:
    """SpeechT5HifiGan keys from the REAL transformers torch module (meta
    device — no allocation), incl. the persistent mean/scale buffers."""
    import torch
    from transformers import SpeechT5HifiGan, SpeechT5HifiGanConfig

    tcfg = SpeechT5HifiGanConfig(
        model_in_dim=cfg.model_in_dim,
        upsample_initial_channel=cfg.upsample_initial_channel,
        upsample_rates=list(cfg.upsample_rates),
        upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
        resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in cfg.resblock_dilation_sizes],
        sampling_rate=cfg.sampling_rate,
        normalize_before=cfg.normalize_before,
    )
    with torch.device("meta"):
        m = SpeechT5HifiGan(tcfg)
    for k, v in m.state_dict().items():
        yield k, tuple(v.shape)


def gpt2_manifest(cfg) -> Iterator[Item]:
    """GPT2Model keys from the real transformers torch module (meta device)."""
    import torch
    from transformers import GPT2Config as TGPT2Config, GPT2Model

    tcfg = TGPT2Config(n_embd=cfg.n_embd, n_layer=cfg.n_layer,
                       n_head=cfg.n_head, n_positions=cfg.n_positions)
    with torch.device("meta"):
        m = GPT2Model(tcfg)
    for k, v in m.state_dict().items():
        yield k, tuple(v.shape)


# ----------------------------------------------------------------- main


def manifests_for(model_id: str):
    """{component: iterator} for one real model id (component names are the
    HF checkpoint subfolder names the converter reads)."""
    from audioeditingcode_tpu.models.audioldm2_cond import (
        AudioLDM2ProjectionConfig,
        GPT2Config,
    )
    from audioeditingcode_tpu.models.registry import resolve_spec

    spec = resolve_spec(model_id)
    if spec.family == "stable-audio":
        return {
            "transformer": dit_manifest(spec.dit),
            "vae": oobleck_manifest(spec.oobleck),
            "projection_model": projection_sa_manifest(spec.projection),
        }
    out = {
        "unet": unet_manifest(spec.unet),
        ("vqvae" if spec.family == "celebahq" else "vae"): vae_manifest(spec.vae),
    }
    if spec.vocoder is not None:
        out["vocoder"] = hifigan_manifest(spec.vocoder)
    if spec.family == "audioldm2":
        out["language_model"] = gpt2_manifest(spec.gpt2 or GPT2Config())
        out["projection_model"] = projection_lm_manifest(
            spec.projection_lm or AudioLDM2ProjectionConfig())
    return out


REAL_MODELS = [
    "cvssp/audioldm-s-full-v2",
    "cvssp/audioldm-l-full",
    "cvssp/audioldm2",
    "cvssp/audioldm2-large",
    "cvssp/audioldm2-music",
    "declare-lab/tango-full-ft-audiocaps",
    "declare-lab/tango-full-ft-audio-music-caps",
    "CompVis/stable-diffusion-v1-4",
    "CompVis/ldm-celebahq-256",
    "stabilityai/stable-audio-open-1.0",
]


def slug(model_id: str) -> str:
    return model_id.replace("/", "__")


def write_all(out_dir: str) -> None:
    for model_id in REAL_MODELS:
        d = os.path.join(out_dir, slug(model_id))
        os.makedirs(d, exist_ok=True)
        for comp, items in manifests_for(model_id).items():
            path = os.path.join(d, f"{comp}.txt")
            n = 0
            with open(path, "w") as f:
                f.write(f"# state-dict key manifest: {model_id} / {comp}\n")
                f.write("# generated by tools/gen_key_manifest.py "
                        "(see its docstring for provenance)\n")
                for key, shape in items:
                    f.write(f"{key}\t{','.join(str(s) for s in shape)}\n")
                    n += 1
            print(f"[+] {path}: {n} tensors")


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out_dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "key_manifests"))
    args = p.parse_args(argv)
    write_all(args.out_dir)


if __name__ == "__main__":
    main()
