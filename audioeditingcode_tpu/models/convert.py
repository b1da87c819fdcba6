"""torch/diffusers state_dict -> Flax params conversion.

The reference loads pretrained HF checkpoints at runtime
(code/models.py:478,556,1055); this framework instead converts those torch
state dicts once into Flax param pytrees. Conversion is name-driven: both
sides are flattened to normalized underscore paths, then tensors are
re-laid-out by rank:

  Linear  (out, in)         -> Dense kernel (in, out)
  Conv2d  (out, in, kh, kw) -> Conv kernel (kh, kw, in, out)
  Conv1d  (out, in, k)      -> Conv kernel (k, in, out)
  ConvT1d (in, out, k)      -> lhs-dilated-conv kernel (k, in, out), k-flipped
  Norm weight               -> scale

No torch import here — state dicts are passed as numpy arrays (use
``load_torch_state_dict`` to read a .bin/.pt/.safetensors file on a machine
with torch installed).
"""

from __future__ import annotations

from typing import Dict, Iterable, Mapping, Tuple

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

# torch module names that differ from ours
_ALIASES = {
    "upsampler": "ups",  # transformers SpeechT5HifiGan
    "time_emb_proj": "time_emb_proj",
}

_LEAF_RENAMES = {
    "weight": None,  # resolved by rank
    "bias": "bias",
    "mean": "mean",
    "scale": "scale",
}


def normalize_torch_key(key: str) -> Tuple[str, str]:
    """'down_blocks.0.resnets.1.conv1.weight' -> ('down_blocks_0_resnets_1_conv1', 'weight')."""
    parts = key.split(".")
    leaf = parts[-1]
    parts = parts[:-1]
    merged = []
    for p in parts:
        p = _ALIASES.get(p, p)
        if p.isdigit() and merged:
            merged[-1] = merged[-1] + "_" + p
        else:
            merged.append(p)
    return "_".join(merged), leaf


def _flax_flat_index(flax_params) -> Dict[str, Tuple[Tuple[str, ...], tuple]]:
    """normalized-path -> (real flax path, shape)."""
    out = {}
    for path, val in flatten_dict(flax_params).items():
        norm = "_".join(path[:-1])
        out.setdefault(norm, {})[path[-1]] = (path, np.shape(val))
    return out


def convert_tensor(
    t: np.ndarray, leaf: str, target_leaf: str, target_shape: tuple,
    is_transpose_conv: bool, transpose_conv_rule: str = "flip_k_in_out",
) -> np.ndarray:
    t = np.asarray(t)
    if leaf in ("weight",):
        if target_leaf == "scale":  # norm
            return t
        if t.ndim == 2:  # Linear
            return t.T
        if t.ndim == 3:  # Conv1d / ConvTranspose1d
            if is_transpose_conv:
                if transpose_conv_rule == "flax_transpose_kernel":
                    # flax nn.ConvTranspose(transpose_kernel=True):
                    # torch (in, out, k) -> (k, out, in), no tap flip
                    # (empirically exact — tests/test_convert_tool.py)
                    return t.transpose(2, 1, 0)
                # lhs-dilated forward conv emulation (hifigan 'ups_'):
                # torch (in, out, k): flip taps, to (k, in, out)
                return t[:, :, ::-1].transpose(2, 0, 1)
            return t.transpose(2, 1, 0)
        if t.ndim == 4:  # Conv2d
            return t.transpose(2, 3, 1, 0)
        if t.ndim == 1:
            return t
        raise ValueError(f"unhandled weight rank {t.ndim}")
    return t


def torch_to_flax_params(
    state_dict: Mapping[str, np.ndarray],
    flax_params,
    transpose_conv_markers: Iterable[str] = ("ups_",),
    strict: bool = True,
    transpose_conv_rule: str = "flip_k_in_out",
):
    """Map a torch state_dict onto an initialized flax param pytree.

    ``flax_params`` supplies the target structure (from module.init);
    returns a new pytree with converted values. With strict=True every
    flax param must be matched and every torch tensor consumed (buffers
    with no flax counterpart are reported).
    """
    index = _flax_flat_index(flax_params)
    flat_out = {}
    unmatched_torch = []
    markers = tuple(transpose_conv_markers)

    for key, tensor in state_dict.items():
        norm, leaf = normalize_torch_key(key)
        entry = index.get(norm)
        if entry is None:
            unmatched_torch.append(key)
            continue
        if leaf == "weight":
            if "scale" in entry and "kernel" not in entry:
                target_leaf = "scale"
            elif "weight" in entry and "kernel" not in entry:
                target_leaf = "weight"  # fixed buffers (Fourier time proj)
            else:
                target_leaf = "kernel"
        else:
            target_leaf = leaf
        if target_leaf not in entry:
            unmatched_torch.append(key)
            continue
        path, shape = entry[target_leaf]
        is_tc = any(m in norm for m in markers)
        converted = convert_tensor(np.asarray(tensor), leaf, target_leaf, shape,
                                   is_tc, transpose_conv_rule)
        if tuple(converted.shape) != tuple(shape):
            raise ValueError(
                f"shape mismatch for {key} -> {'/'.join(path)}: "
                f"{converted.shape} vs expected {shape}"
            )
        flat_out[path] = converted

    missing = [p for p, _ in flatten_dict(flax_params).items() if p not in flat_out]
    if strict and missing:
        raise ValueError(f"flax params not found in torch state dict: {missing[:10]} "
                         f"(+{max(0, len(missing)-10)} more)")
    if strict and unmatched_torch:
        # num_batches_tracked / position buffers etc. are fine to drop; report others
        real = [k for k in unmatched_torch if not k.endswith("num_batches_tracked")]
        if real:
            raise ValueError(f"torch tensors with no flax target: {real[:10]} "
                             f"(+{max(0, len(real)-10)} more)")
    # keep existing values for any unmatched flax params (non-strict mode)
    base = dict(flatten_dict(flax_params))
    base.update(flat_out)
    return unflatten_dict(base)


def fold_weight_norm(state_dict: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fold torch weight-norm parametrizations into plain weights.

    Handles both layouts:
      old:  <mod>.weight_g + <mod>.weight_v
      new:  <mod>.parametrizations.weight.original0 (g) + ...original1 (v)
    weight = g * v / ||v||, with the norm over all axes except dim 0
    (torch's default weight_norm dim=0 — per-output-channel).

    Needed for the Oobleck VAE and HiFi-GAN checkpoints, whose convs are all
    weight-normed at rest (reference: hifigan remove_weight_norm at load,
    code/audioldm/hifigan/utilities.py:73-76).
    """
    out: Dict[str, np.ndarray] = {}
    pairs: Dict[str, Dict[str, np.ndarray]] = {}
    def base_of(key: str, suffix: str):
        return key[: -len(suffix)].rstrip(".")

    for k, v in state_dict.items():
        if k.endswith("weight_g"):
            pairs.setdefault(base_of(k, "weight_g"), {})["g"] = np.asarray(v)
        elif k.endswith("weight_v"):
            pairs.setdefault(base_of(k, "weight_v"), {})["v"] = np.asarray(v)
        elif k.endswith("parametrizations.weight.original0"):
            base = base_of(k, "parametrizations.weight.original0")
            pairs.setdefault(base, {})["g"] = np.asarray(v)
        elif k.endswith("parametrizations.weight.original1"):
            base = base_of(k, "parametrizations.weight.original1")
            pairs.setdefault(base, {})["v"] = np.asarray(v)
        else:
            out[k] = np.asarray(v)
    for base, gv in pairs.items():
        if "g" not in gv or "v" not in gv:
            raise ValueError(f"incomplete weight-norm pair at {base}")
        v = gv["v"]
        norm = np.sqrt(np.sum(v ** 2, axis=tuple(range(1, v.ndim)), keepdims=True))
        key = (base + ".weight") if base else "weight"
        out[key] = gv["g"] * v / np.maximum(norm, 1e-12)
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint file into numpy arrays (requires torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().numpy() for k, v in sd.items() if hasattr(v, "detach")}
