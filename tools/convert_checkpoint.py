#!/usr/bin/env python
"""Convert pretrained torch/diffusers checkpoints into this framework's
Flax weight directories.

The reference loads HF checkpoints at runtime (reference:
code/models.py:478,556,1055 from_pretrained calls); this framework converts
them ONCE into msgpack param files consumed by models.registry.load_model's
``weights_dir``:

  <out>/unet.msgpack  vae.msgpack  vocoder.msgpack          (mel families)
  <out>/dit.msgpack   oobleck.msgpack  projection.msgpack   (stable audio)
  <out>/gpt2.msgpack  projection_lm.msgpack                 (audioldm2 LM)
  <out>/t5/  clap_text/                                     (transformers dirs)

Usage (on a machine with the checkpoint downloaded, e.g. via
``huggingface_hub.snapshot_download``):

  python tools/convert_checkpoint.py --model_id cvssp/audioldm-s-full-v2 \\
      --src /path/to/checkpoint --out weights/audioldm-s

Every tensor's shape is cross-checked against the initialized Flax module,
so architecture drift fails loudly at conversion time.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from typing import Dict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audioeditingcode_tpu.models.convert import (  # noqa: E402
    fold_weight_norm,
    torch_to_flax_params,
)


# ----------------------------------------------------------- IO helpers
def load_subfolder_state_dict(src: str, subfolder: str) -> Dict[str, np.ndarray]:
    """Read all .safetensors/.bin weights under <src>/<subfolder>."""
    d = os.path.join(src, subfolder)
    if not os.path.isdir(d):
        raise FileNotFoundError(f"missing checkpoint subfolder: {d}")
    sd: Dict[str, np.ndarray] = {}
    for f in sorted(os.listdir(d)):
        p = os.path.join(d, f)
        if f.endswith(".safetensors"):
            from safetensors.numpy import load_file

            sd.update(load_file(p))
        elif f.endswith((".bin", ".pt", ".pth", ".ckpt")):
            from audioeditingcode_tpu.models.convert import load_torch_state_dict

            sd.update(load_torch_state_dict(p))
    if not sd:
        raise FileNotFoundError(f"no weight files found in {d}")
    return sd


def save_msgpack(params, path: str) -> None:
    from flax import serialization

    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))
    print(f"[+] wrote {path}")


def _rename(sd: Dict[str, np.ndarray], rules) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        for pat, rep in rules:
            k = re.sub(pat, rep, k)
        out[k] = v
    return out


# ----------------------------------------------------- dedicated converters
def convert_gpt2(sd: Dict[str, np.ndarray], flax_params):
    """GPT-2 language model (AudioLDM2). torch Conv1D weights are already
    (in, out) — no transpose; wte (vocab embedding) is unused by the
    embeds-in/embeds-out generation loop."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = dict(flatten_dict(flax_params))
    out = dict(flat)
    consumed = set()

    def put(path, val):
        if tuple(np.shape(val)) != tuple(np.shape(flat[path])):
            raise ValueError(f"gpt2 shape mismatch at {path}: "
                             f"{np.shape(val)} vs {np.shape(flat[path])}")
        out[path] = np.asarray(val)
        consumed.add(path)

    for k, v in sd.items():
        k = k.removeprefix("transformer.")
        if k == "wpe.weight":
            put(("params", "wpe"), v)
        elif k == "wte.weight" or k.endswith(".attn.bias") or k.endswith(".attn.masked_bias"):
            continue  # vocab embedding / causal-mask buffers: unused
        elif k.startswith("ln_f."):
            leaf = "scale" if k.endswith("weight") else "bias"
            put(("params", "ln_f", leaf), v)
        elif m := re.match(r"h\.(\d+)\.(ln_[12])\.(weight|bias)", k):
            leaf = "scale" if m.group(3) == "weight" else "bias"
            put(("params", f"h_{m.group(1)}", m.group(2), leaf), v)
        elif m := re.match(r"h\.(\d+)\.attn\.(c_attn|c_proj)\.(weight|bias)", k):
            leaf = "kernel" if m.group(3) == "weight" else "bias"
            put(("params", f"h_{m.group(1)}", m.group(2), leaf), v)
        elif m := re.match(r"h\.(\d+)\.mlp\.c_fc\.(weight|bias)", k):
            leaf = "kernel" if m.group(2) == "weight" else "bias"
            put(("params", f"h_{m.group(1)}", "c_fc", leaf), v)
        elif m := re.match(r"h\.(\d+)\.mlp\.c_proj\.(weight|bias)", k):
            leaf = "kernel" if m.group(2) == "weight" else "bias"
            put(("params", f"h_{m.group(1)}", "mlp_c_proj", leaf), v)
        else:
            raise ValueError(f"unhandled gpt2 key: {k}")

    missing = [p for p in flat if p not in consumed]
    if missing:
        raise ValueError(f"gpt2 params not converted: {missing[:8]}")
    return unflatten_dict(out)


def convert_projection_lm(sd: Dict[str, np.ndarray], flax_params):
    """AudioLDM2ProjectionModel: two linears + 4 sos/eos embeds."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = dict(flatten_dict(flax_params))
    out = dict(flat)
    for k, v in sd.items():
        v = np.asarray(v)
        if k in ("sos_embed", "eos_embed", "sos_embed_1", "eos_embed_1"):
            out[("params", k)] = v
        elif m := re.match(r"(projection|projection_1)\.(weight|bias)", k):
            leaf = "kernel" if m.group(2) == "weight" else "bias"
            out[("params", m.group(1), leaf)] = v.T if leaf == "kernel" else v
        else:
            raise ValueError(f"unhandled projection key: {k}")
    return unflatten_dict(out)


def convert_dit(sd: Dict[str, np.ndarray], flax_params):
    """Stable Audio DiT. Sequential projections are renamed to linear_1/2,
    the 1x1 pre/post convs become Dense kernels, and the fixed Fourier
    time-proj weight maps to the 'weight' param."""
    sd = _rename(sd, [
        (r"(timestep_proj|global_proj|cross_attention_proj)\.0\.", r"\1.linear_1."),
        (r"(timestep_proj|global_proj|cross_attention_proj)\.2\.", r"\1.linear_2."),
    ])
    fixed = {}
    for k, v in sd.items():
        v = np.asarray(v)
        if k in ("preprocess_conv.weight", "postprocess_conv.weight"):
            v = v[:, :, 0].T  # Conv1d k=1 (out,in,1) -> Dense (in,out)
            fixed[k.replace("conv.weight", "conv.kernelmarker")] = v
        elif k == "time_proj.weight":
            fixed["time_proj.weightmarker"] = v
        else:
            fixed[k] = v

    params = {"params": torch_to_flax_params(fixed, flax_params["params"],
                                             strict=False)}
    # inject the specially-shaped tensors
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = dict(flatten_dict(params))
    for k, v in fixed.items():
        if k.endswith("kernelmarker"):
            name = k.split(".")[0]
            flat[("params", name, "kernel")] = np.asarray(v)
        elif k.endswith("weightmarker"):
            flat[("params", "time_proj", "weight")] = np.asarray(v)
    return unflatten_dict(flat)


def convert_oobleck(sd: Dict[str, np.ndarray], flax_params):
    """Oobleck VAE: fold weight norm, transpose Snake params, and map the
    transposed convs (validated by tests/test_convert_tool.py parity)."""
    sd = fold_weight_norm(sd)
    fixed = {}
    for k, v in sd.items():
        v = np.asarray(v)
        if re.search(r"snake\d\.(alpha|beta)", k):
            v = v.transpose(0, 2, 1)  # (1, C, 1) -> (1, 1, C)
        fixed[k] = v
    return {"params": torch_to_flax_params(
        fixed, flax_params["params"], transpose_conv_markers=("conv_t1",),
        strict=False, transpose_conv_rule="flax_transpose_kernel",
    )}


def convert_projection_sa(sd: Dict[str, np.ndarray], flax_params):
    """StableAudioProjectionModel: text_projection Sequential(0,2) +
    number conditioners (positional weights + linear)."""
    sd = _rename(sd, [
        (r"(start|end)_number_conditioner\.time_positional_embedding\.0\.weights",
         r"\1_number_conditioner.time_positional_embedding_0.weights"),
        (r"(start|end)_number_conditioner\.time_positional_embedding\.1\.",
         r"\1_number_conditioner.time_positional_embedding_1."),
    ])
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = dict(flatten_dict(flax_params))
    out = dict(flat)
    for k, v in sd.items():
        v = np.asarray(v)
        parts = k.split(".")
        leaf = parts[-1]
        if leaf == "weights":
            out[("params",) + tuple(parts[:-1]) + ("weights",)] = v
        elif leaf == "weight":
            out[("params",) + tuple(parts[:-1]) + ("kernel",)] = v.T
        elif leaf == "bias":
            out[("params",) + tuple(parts[:-1]) + ("bias",)] = v
        else:
            raise ValueError(f"unhandled projection key {k}")
    return unflatten_dict(out)


def convert_vocoder(sd: Dict[str, np.ndarray], flax_params, normalize_before: bool):
    """SpeechT5HifiGan: fold weight norm; the persistent mean/scale buffers
    are consumed only when normalize_before=True (transformers
    modeling_speecht5.py forward) — the AudioLDM configs run False, where
    the flax module has no such params, so they are dropped explicitly."""
    sd = fold_weight_norm(sd)
    if not normalize_before:
        sd = {k: v for k, v in sd.items() if k not in ("mean", "scale")}
    return {"params": torch_to_flax_params(sd, flax_params["params"], strict=True)}


# ----------------------------------------------------------------- main
def convert(model_id: str, src: str, out: str) -> None:
    import jax.numpy as jnp

    from audioeditingcode_tpu.models.registry import load_model, resolve_spec

    spec = resolve_spec(model_id)
    os.makedirs(out, exist_ok=True)
    pipe = load_model(model_id, num_diffusion_steps=8, dtype=jnp.float32)

    if spec.family == "stable-audio":
        save_msgpack(convert_dit(load_subfolder_state_dict(src, "transformer"),
                                 pipe.dit_params), os.path.join(out, "dit.msgpack"))
        save_msgpack(convert_oobleck(load_subfolder_state_dict(src, "vae"),
                                     pipe.vae_params),
                     os.path.join(out, "oobleck.msgpack"))
        save_msgpack(convert_projection_sa(
            load_subfolder_state_dict(src, "projection_model"),
            pipe.projection_params), os.path.join(out, "projection.msgpack"))
        _export_t5(src, out)
        return

    save_msgpack({"params": torch_to_flax_params(
        load_subfolder_state_dict(src, "unet"),
        pipe.unet_params["params"], strict=False)},
        os.path.join(out, "unet.msgpack"))
    vae_subfolder = "vqvae" if spec.family == "celebahq" else "vae"
    vae_sd = load_subfolder_state_dict(src, vae_subfolder)
    if spec.family == "celebahq":
        # VQ codebook: quantize.embedding.weight -> top-level 'codebook' param
        vae_sd = _rename(vae_sd, [(r"quantize\.embedding\.weight", "codebook")])
        cb = vae_sd.pop("codebook")
        params = torch_to_flax_params(vae_sd, pipe.vae_params["params"], strict=False)
        params = dict(params)
        params["codebook"] = np.asarray(cb)
        save_msgpack({"params": params}, os.path.join(out, "vae.msgpack"))
    else:
        save_msgpack({"params": torch_to_flax_params(
            vae_sd, pipe.vae_params["params"], strict=False)},
            os.path.join(out, "vae.msgpack"))
    if spec.vocoder is not None:
        save_msgpack(convert_vocoder(
            load_subfolder_state_dict(src, "vocoder"), pipe.vocoder_params,
            spec.vocoder.normalize_before),
            os.path.join(out, "vocoder.msgpack"))

    if spec.family == "audioldm2":
        from audioeditingcode_tpu.models.audioldm2_cond import (
            AudioLDM2ProjectionConfig,
            AudioLDM2ProjectionModel,
            GPT2Config,
            GPT2Model,
        )
        import jax

        gpt2_cfg = spec.gpt2 or GPT2Config()
        gpt2 = GPT2Model(gpt2_cfg)
        g_init = gpt2.init(jax.random.PRNGKey(0),
                           jnp.ones((1, 4, gpt2_cfg.n_embd)), jnp.ones((1, 4)))
        save_msgpack(convert_gpt2(
            load_subfolder_state_dict(src, "language_model"), g_init),
            os.path.join(out, "gpt2.msgpack"))

        proj_cfg = spec.projection_lm or AudioLDM2ProjectionConfig()
        proj = AudioLDM2ProjectionModel(proj_cfg)
        p_init = proj.init(jax.random.PRNGKey(0),
                           jnp.ones((1, 1, proj_cfg.text_encoder_dim)),
                           jnp.ones((1, 4, proj_cfg.text_encoder_1_dim)))
        save_msgpack(convert_projection_lm(
            load_subfolder_state_dict(src, "projection_model"), p_init),
            os.path.join(out, "projection_lm.msgpack"))
        # AudioLDM2 layout: tokenizer = RoBERTa (CLAP), tokenizer_2 = T5
        _export_t5(src, out, subfolder="text_encoder_2",
                   tokenizer_subfolder="tokenizer_2")
        _export_clap_text(src, out)
    elif spec.family == "audioldm":
        _export_clap_text(src, out)
    elif spec.text_encoder == "t5":
        _export_t5(src, out, subfolder="text_encoder")
    elif spec.text_encoder == "clip":
        _export_clip(src, out)


def _export_clip(src: str, out: str) -> None:
    """Export the CLIP text encoder (Stable Diffusion) as transformers-Flax."""
    try:
        from transformers import AutoTokenizer, FlaxCLIPTextModel

        clip = FlaxCLIPTextModel.from_pretrained(
            os.path.join(src, "text_encoder"), from_pt=True
        )
        d = os.path.join(out, "clip")
        clip.save_pretrained(d)
        AutoTokenizer.from_pretrained(os.path.join(src, "tokenizer")).save_pretrained(d)
        print(f"[+] wrote {d}")
    except Exception as e:
        print(f"[!] clip export skipped: {e}")


def _export_t5(src: str, out: str, subfolder: str = "text_encoder",
               tokenizer_subfolder: str = "tokenizer") -> None:
    """Export the T5 encoder as a transformers-Flax directory."""
    try:
        from transformers import AutoTokenizer, FlaxT5EncoderModel

        t5 = FlaxT5EncoderModel.from_pretrained(
            os.path.join(src, subfolder), from_pt=True
        )
        tok = AutoTokenizer.from_pretrained(os.path.join(src, tokenizer_subfolder))
        d = os.path.join(out, "t5")
        t5.save_pretrained(d)
        tok.save_pretrained(d)
        print(f"[+] wrote {d}")
    except Exception as e:
        print(f"[!] t5 export skipped: {e}")


def _export_clap_text(src: str, out: str) -> None:
    """Export the CLAP text branch: RoBERTa weights (incl. the POOLER the
    projection consumes — transformers ClapModel.get_text_features projects
    pooler_output) + the 2-layer projection.

    The checkpoint's text_encoder subfolder holds a ClapTextModelWithProjection
    (AudioLDM) or a full ClapModel (AudioLDM2); either way the transformer
    body lives under the ``text_model.`` prefix and is architecturally a
    RobertaModel ("Copied from" in transformers modeling_clap.py), so we
    re-home the weights into a plain RobertaModel and export THAT as
    transformers-Flax — loading the prefixed state dict into FlaxRobertaModel
    directly would silently random-init every layer.
    """
    try:
        import tempfile
        import torch
        from transformers import (
            AutoTokenizer,
            ClapTextModelWithProjection,
            FlaxRobertaModel,
            RobertaConfig,
            RobertaModel,
        )

        m = ClapTextModelWithProjection.from_pretrained(
            os.path.join(src, "text_encoder")
        )
        d = os.path.join(out, "clap_text")
        os.makedirs(d, exist_ok=True)

        tc = m.config
        rcfg = RobertaConfig(
            vocab_size=tc.vocab_size, hidden_size=tc.hidden_size,
            num_hidden_layers=tc.num_hidden_layers,
            num_attention_heads=tc.num_attention_heads,
            intermediate_size=tc.intermediate_size,
            max_position_embeddings=tc.max_position_embeddings,
            type_vocab_size=tc.type_vocab_size, pad_token_id=tc.pad_token_id,
            layer_norm_eps=tc.layer_norm_eps, hidden_act=tc.hidden_act,
        )
        roberta = RobertaModel(rcfg)
        # CLAP persists position_ids/token_type_ids buffers (persistent=True
        # in modeling_clap.py); Roberta keeps them non-persistent — drop them
        buffers = ("position_ids", "token_type_ids")
        body_sd = {k.removeprefix("text_model."): v
                   for k, v in m.state_dict().items()
                   if k.startswith("text_model.")
                   and not k.endswith(buffers)}
        missing, unexpected = roberta.load_state_dict(body_sd, strict=False)
        real_missing = [k for k in missing if not k.endswith(buffers)]
        if real_missing or unexpected:
            raise ValueError(f"clap->roberta mapping incomplete: "
                             f"missing={real_missing[:5]} unexpected={unexpected[:5]}")
        with tempfile.TemporaryDirectory() as tmp:
            roberta.save_pretrained(tmp, safe_serialization=False)
            fl = FlaxRobertaModel.from_pretrained(tmp, from_pt=True)
        fl.save_pretrained(d)
        AutoTokenizer.from_pretrained(os.path.join(src, "tokenizer")).save_pretrained(d)
        proj = m.text_projection
        np.savez(
            os.path.join(d, "text_projection.npz"),
            w1=proj.linear1.weight.detach().numpy(),
            b1=proj.linear1.bias.detach().numpy(),
            w2=proj.linear2.weight.detach().numpy(),
            b2=proj.linear2.bias.detach().numpy(),
        )
        print(f"[+] wrote {d}")
    except Exception as e:
        print(f"[!] clap_text export skipped: {e}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_id", required=True)
    p.add_argument("--src", required=True,
                   help="local checkpoint dir (diffusers pipeline layout)")
    p.add_argument("--out", required=True, help="output weights_dir")
    args = p.parse_args(argv)
    # conversion is host-side tensor surgery: honor AEC_PLATFORM=cpu so it
    # never waits on a remote TPU backend
    from audioeditingcode_tpu.cli.common import apply_platform_override

    apply_platform_override()
    convert(args.model_id, args.src, args.out)


if __name__ == "__main__":
    main()
