"""Shared CLI plumbing: seeding, output naming, artifact saving, wandb stub.

Mirrors the reference CLI behaviours (code/utils.py:98-116 reproducibility,
code/main_run.py:80-102 output naming / wandb) on the JAX stack. wandb is
optional — if the package is missing or disabled, logging is a no-op.
"""

from __future__ import annotations

import calendar
import json
import os
import random
import time
from typing import List, Optional

import numpy as np


def set_reproducibility(seed: Optional[int]):
    """Seed host RNGs; returns the JAX PRNG seed to use (random if None)."""
    if seed is None:
        seed = int.from_bytes(os.urandom(4), "little")
    random.seed(seed)
    np.random.seed(seed % (2 ** 32))
    return seed


def timestamp_name() -> int:
    return calendar.timegm(time.gmtime())


def join_prompts(prompts: List[str]) -> str:
    return "__".join(x.replace(" ", "_") for x in prompts)


def edit_save_path(results_path: str, model_id: str, init_aud: str,
                   source_prompt: List[str], target_prompt: List[str],
                   target_neg_prompt: List[str]) -> str:
    """results dir layout of code/main_run.py:137-143."""
    return os.path.join(
        results_path,
        model_id.split("/")[1] if "/" in model_id else model_id,
        os.path.basename(init_aud).split(".")[0],
        "src_" + join_prompts(source_prompt),
        "dec_" + join_prompts(target_prompt) + "__neg__" + join_prompts(target_neg_prompt),
    )


def edit_image_name(mode: str, cfg_src, cfg_tar, skip, num_steps: int) -> str:
    """output basename of code/main_run.py:199-211."""
    ts = timestamp_name()
    base = (
        f'cfg_e_{"-".join(str(x) for x in cfg_src)}_'
        f'cfg_d_{"-".join(str(x) for x in cfg_tar)}_'
    )
    skips = np.atleast_1d(np.asarray(skip))
    if mode == "ours" or (skips != 0).any():
        return base + f'skip_{"-".join(str(int(x)) for x in skips)}_{ts}'
    return base + f"{num_steps}timesteps_{ts}"


def save_spectrogram_png(path: str, spec: np.ndarray) -> None:
    """plt.imsave equivalent (reference main_run.py:222); transposes tall
    spectrograms like main_run.py:216-221."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if spec.ndim == 4:
        spec = spec[0, 0]
    if spec.shape[0] > spec.shape[1]:
        spec = spec.T
    plt.imsave(path, spec)


class WandbStub:
    """No-op drop-in used when wandb is unavailable or disabled."""

    def __getattr__(self, name):
        def _noop(*a, **k):
            return self

        return _noop


def init_wandb(args, job_type: str, name: str):
    if getattr(args, "wandb_disable", True):
        return WandbStub()
    try:
        import wandb
    except ImportError:
        print("[!] wandb not installed; logging disabled")
        return WandbStub()
    run = wandb.init(project="AudInv", config={}, name=args.wandb_name or name,
                     group=args.wandb_group, job_type=job_type)
    wandb.config.update(vars(args))
    return wandb


def dump_run_summary(save_path: str, args, extra=None) -> None:
    """Machine-readable run record alongside the artifacts (supplements the
    reference's filename-as-config convention, evals/utils.py:269-287)."""
    payload = {k: v for k, v in vars(args).items() if not k.startswith("_")}
    payload = {k: (v.tolist() if isinstance(v, np.ndarray) else v) for k, v in payload.items()}
    if extra:
        payload.update(extra)
    with open(os.path.join(save_path, "run_args.json"), "w") as f:
        json.dump(payload, f, indent=2, default=str)
