"""Flax CLAP-HTSAT audio tower (swin transformer) for the eval metrics.

JAX re-implementation of the HTSAT audio encoder the reference's metrics
are bound to (reference evals/pretrained_networks.py:12-168 wraps
LAION-CLAP; the torch `transformers.ClapModel` is this repo's oracle in
evals/features.py). Moves LPAPS stage features and CLAP audio embeddings
onto the TPU; numerics mirror transformers' ClapAudioModel exactly
(eval-mode BatchNorm, bicubic align-corners time interpolation, swin
window attention with relative-position bias and shifted-window masks,
patch merging, freq-grouped average pooling, MLP projection head).

Weights convert from a torch ClapModel via ``params_from_torch_clap``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Tuple

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ClapAudioConfig:
    spec_size: int = 256
    patch_size: int = 4
    patch_stride: int = 4
    num_mel_bins: int = 64
    window_size: int = 8
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_attention_heads: Tuple[int, ...] = (4, 8, 16, 32)
    patch_embeds_hidden_size: int = 96
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-5
    projection_dim: int = 512

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // self.num_mel_bins

    @property
    def num_features(self) -> int:
        return int(self.patch_embeds_hidden_size * 2 ** (len(self.depths) - 1))


# ----------------------------------------------------------------- helpers

def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """torch bicubic convolution kernel (Keys, A=-0.75)."""
    x = np.abs(x)
    out = np.where(
        x <= 1, (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1,
        np.where(x < 2, a * x ** 3 - 5 * a * x ** 2 + 8 * a * x - 4 * a, 0.0),
    )
    return out


def cubic_resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) matrix reproducing torch's 1-D bicubic interpolation
    with align_corners=True (used along the time axis by reshape_mel2img,
    modeling_clap.py reshape_mel2img)."""
    if n_in == n_out:
        return np.eye(n_in, dtype=np.float32)
    scale = (n_in - 1) / (n_out - 1)
    W = np.zeros((n_out, n_in), np.float32)
    for o in range(n_out):
        src = o * scale
        i0 = int(np.floor(src))
        for tap in range(-1, 3):
            i = i0 + tap
            w = _cubic_kernel(np.asarray(src - i))
            ic = min(max(i, 0), n_in - 1)  # replicate border
            W[o, ic] += w
    return W


def _window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * H/ws * W/ws, ws*ws, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def _window_reverse(w: jnp.ndarray, ws: int, H: int, W: int) -> jnp.ndarray:
    C = w.shape[-1]
    x = w.reshape(-1, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, H, W, C)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # (ws*ws, ws*ws)


def _shift_attn_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """(num_windows, ws*ws, ws*ws) additive mask for shifted windows
    (modeling_clap.py ClapAudioLayer.get_attn_mask)."""
    img = np.zeros((1, H, W, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    mw = np.asarray(_window_partition(jnp.asarray(img), ws))[..., 0]  # (nW, ws*ws)
    m = mw[:, None, :] - mw[:, :, None]
    return np.where(m != 0, -100.0, 0.0).astype(np.float32)


def _layer_norm(x, p, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["weight"] + p["bias"]


def _linear(x, p):
    y = x @ p["weight"].T
    return y + p["bias"] if "bias" in p else y


# ----------------------------------------------------------------- blocks

def _swin_block(x, p, cfg: ClapAudioConfig, H: int, W: int, heads: int,
                shift: int):
    """(B, H*W, C) -> same. Mirrors ClapAudioLayer.forward."""
    ws = cfg.window_size
    if min(H, W) <= cfg.window_size:  # set_shift_and_window_size
        ws, shift = min(H, W), 0
    B, L, C = x.shape
    shortcut = x
    h = _layer_norm(x, p["layernorm_before"], cfg.layer_norm_eps)
    h = h.reshape(B, H, W, C)
    if shift > 0:
        h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
    win = _window_partition(h, ws)  # (B*nW, ws*ws, C)

    hd = C // heads
    q = _linear(win, p["attn"]["query"]).reshape(-1, ws * ws, heads, hd)
    k = _linear(win, p["attn"]["key"]).reshape(-1, ws * ws, heads, hd)
    v = _linear(win, p["attn"]["value"]).reshape(-1, ws * ws, heads, hd)
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    scores = (q @ k.transpose(0, 1, 3, 2)) / math.sqrt(hd)

    idx = _relative_position_index(ws).reshape(-1)
    bias = p["attn"]["relative_position_bias_table"][idx]
    bias = bias.reshape(ws * ws, ws * ws, heads).transpose(2, 0, 1)
    scores = scores + bias[None]

    if shift > 0:
        mask = jnp.asarray(_shift_attn_mask(H, W, ws, shift))  # (nW, L, L)
        nW = mask.shape[0]
        scores = scores.reshape(B, nW, heads, ws * ws, ws * ws)
        scores = scores + mask[None, :, None]
        scores = scores.reshape(-1, heads, ws * ws, ws * ws)

    probs = jnp.exp(scores - scores.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    ctx = (probs @ v).transpose(0, 2, 1, 3).reshape(-1, ws * ws, C)
    ctx = _linear(ctx, p["attn"]["output"])

    h = _window_reverse(ctx, ws, H, W)
    if shift > 0:
        h = jnp.roll(h, (shift, shift), axis=(1, 2))
    x = shortcut + h.reshape(B, L, C)

    h = _layer_norm(x, p["layernorm_after"], cfg.layer_norm_eps)
    h = _linear(h, p["intermediate"])
    h = _gelu(h)
    h = _linear(h, p["output"])
    return x + h


def _gelu(x):
    """Exact (erf) GELU — torch ACT2FN['gelu']."""
    from jax.scipy.special import erf

    return 0.5 * x * (1.0 + erf(x / math.sqrt(2.0)))


def _patch_merge(x, p, cfg: ClapAudioConfig, H: int, W: int):
    """(B, H*W, C) -> (B, H/2*W/2, 2C). Mirrors ClapAudioPatchMerging."""
    B, L, C = x.shape
    x = x.reshape(B, H, W, C)
    parts = [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]]
    x = jnp.concatenate(parts, axis=-1).reshape(B, -1, 4 * C)
    x = _layer_norm(x, p["norm"], cfg.layer_norm_eps)
    return x @ p["reduction"]["weight"].T


# ----------------------------------------------------------------- model

def reshape_mel2img(feats: jnp.ndarray, cfg: ClapAudioConfig) -> jnp.ndarray:
    """(B, 1, T, M) normalized mel -> (B, 1, S, S) swin image
    (modeling_clap.py ClapAudioEncoder.reshape_mel2img)."""
    B, C, T, M = feats.shape
    fr = cfg.freq_ratio
    spec_w = cfg.spec_size * fr
    spec_h = cfg.spec_size // fr
    if T > spec_w or M > spec_h:
        raise ValueError("input longer than the swin input size")
    if T < spec_w:
        Wm = jnp.asarray(cubic_resize_matrix(T, spec_w))
        feats = jnp.einsum("ot,bctm->bcom", Wm, feats)
    if M < spec_h:
        Wm = jnp.asarray(cubic_resize_matrix(M, spec_h))
        feats = jnp.einsum("om,bctm->bcto", Wm, feats)
    B, C, T, M = feats.shape
    x = feats.reshape(B, C * fr, T // fr, M)
    x = x.transpose(0, 1, 3, 2)
    return x.reshape(B, C, M * fr, T // fr)


def clap_audio_forward(
    params: Dict,
    input_features: jnp.ndarray,  # (B, 1, T, num_mel_bins) processor output
    cfg: ClapAudioConfig,
) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """Returns (hidden_features [(B, C_i, H_i, W_i)] x (1 + len(depths)),
    pooled).

    hidden_features match transformers' ``output.hidden_states`` exactly:
    the patch-embed output followed by each stage's (post-downsample)
    output, reshaped — LPAPS consumes the last four (reference
    evals/pretrained_networks.py:114-127); ``pooled`` matches
    ``pooler_output`` (feeds the projection head)."""
    eps = 1e-5
    bn = params["batch_norm"]
    # BatchNorm2d over the mel-bin axis, eval mode (modeling_clap.py:
    # input transposed so num_mel_bins is the channel dim)
    f = (input_features - bn["running_mean"][None, None, None]) / jnp.sqrt(
        bn["running_var"][None, None, None] + eps)
    f = f * bn["weight"][None, None, None] + bn["bias"][None, None, None]

    img = reshape_mel2img(f, cfg)  # (B, 1, S, S)

    # patch embed: conv k=patch_size s=stride (pad 0 for k==s) + LayerNorm
    pe = params["patch_embed"]
    B = img.shape[0]
    S = cfg.spec_size
    ps = cfg.patch_stride
    x = img.transpose(0, 2, 3, 1)  # NHWC
    x = x.reshape(B, S // ps, ps, S // ps, ps, 1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, (S // ps) ** 2, ps * ps)
    w = pe["proj"]["weight"].reshape(cfg.patch_embeds_hidden_size, -1)  # (E, 1*ps*ps)
    x = x @ w.T + pe["proj"]["bias"]
    x = _layer_norm(x, pe["norm"], cfg.layer_norm_eps)

    H = W = S // ps
    stages_out = [x.reshape(B, H, W, -1).transpose(0, 3, 1, 2)]
    for si, depth in enumerate(cfg.depths):
        sp = params["layers"][si]
        heads = cfg.num_attention_heads[si]
        for bi in range(depth):
            shift = 0 if bi % 2 == 0 else cfg.window_size // 2
            x = _swin_block(x, sp["blocks"][bi], cfg, H, W, heads, shift)
        if si < len(cfg.depths) - 1:
            x = _patch_merge(x, sp["downsample"], cfg, H, W)
            H, W = H // 2, W // 2
        C = x.shape[-1]
        stages_out.append(x.reshape(B, H, W, C).transpose(0, 3, 1, 2))

    # final norm + freq-grouped average pool (modeling_clap.py encoder tail)
    x = _layer_norm(x, params["norm"], cfg.layer_norm_eps)
    C = x.shape[-1]
    frames_num = cfg.spec_size  # img height after reshape_mel2img
    fs = frames_num // (2 ** (len(cfg.depths) - 1)) // cfg.patch_stride
    x = x.transpose(0, 2, 1).reshape(B, C, fs, fs)
    cfb = fs // cfg.freq_ratio
    x = x.reshape(B, C, fs // cfb, cfb, fs)
    x = x.transpose(0, 1, 3, 2, 4).reshape(B, C, cfb, -1)
    pooled = x.reshape(B, C, -1).mean(-1)
    return stages_out, pooled


def clap_audio_embed(params: Dict, pooled: jnp.ndarray) -> jnp.ndarray:
    """ClapProjectionLayer: linear -> ReLU -> linear (modeling_clap.py)."""
    pr = params["projection"]
    h = _linear(pooled, pr["linear1"])
    h = jnp.maximum(h, 0.0)
    return _linear(h, pr["linear2"])


# ----------------------------------------------------------- conversion

def params_from_torch_clap(model) -> Tuple[Dict, ClapAudioConfig]:
    """Build the params pytree from a torch ``transformers.ClapModel``
    (or ``ClapAudioModel`` + separate projection)."""
    audio = model.audio_model.audio_encoder
    acfg = model.config.audio_config if hasattr(model.config, "audio_config") \
        else model.config
    cfg = ClapAudioConfig(
        spec_size=acfg.spec_size,
        patch_size=acfg.patch_size,
        patch_stride=acfg.patch_stride[0] if isinstance(acfg.patch_stride, (list, tuple)) else acfg.patch_stride,
        num_mel_bins=acfg.num_mel_bins,
        window_size=acfg.window_size,
        depths=tuple(acfg.depths),
        num_attention_heads=tuple(acfg.num_attention_heads),
        patch_embeds_hidden_size=acfg.patch_embeds_hidden_size,
        mlp_ratio=acfg.mlp_ratio,
        layer_norm_eps=acfg.layer_norm_eps,
        projection_dim=acfg.projection_dim,
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
        "batch_norm": {
            "weight": t(audio.batch_norm.weight),
            "bias": t(audio.batch_norm.bias),
            "running_mean": t(audio.batch_norm.running_mean),
            "running_var": t(audio.batch_norm.running_var),
        },
        "patch_embed": {
            "proj": {"weight": t(audio.patch_embed.proj.weight),
                     "bias": t(audio.patch_embed.proj.bias)},
            "norm": ln(audio.patch_embed.norm),
        },
        "norm": ln(audio.norm),
        "layers": [],
    }
    for stage in audio.layers:
        sp = {"blocks": []}
        for blk in stage.blocks:
            sp["blocks"].append({
                "layernorm_before": ln(blk.layernorm_before),
                "layernorm_after": ln(blk.layernorm_after),
                "attn": {
                    "query": lin(blk.attention.self.query),
                    "key": lin(blk.attention.self.key),
                    "value": lin(blk.attention.self.value),
                    "output": lin(blk.attention.output.dense),
                    "relative_position_bias_table":
                        t(blk.attention.self.relative_position_bias_table),
                },
                "intermediate": lin(blk.intermediate.dense),
                "output": lin(blk.output.dense),
            })
        if stage.downsample is not None:
            sp["downsample"] = {
                "norm": ln(stage.downsample.norm),
                "reduction": {"weight": t(stage.downsample.reduction.weight)},
            }
        params["layers"].append(sp)

    if hasattr(model, "audio_projection"):
        params["projection"] = {
            "linear1": lin(model.audio_projection.linear1),
            "linear2": lin(model.audio_projection.linear2),
        }
    return params, cfg
