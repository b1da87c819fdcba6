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
    """Seed host RNGs; returns the JAX PRNG seed to use (random if None).

    Also enables the persistent compilation cache (utils/jax_setup.py)."""
    from ..utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
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


def plot_corrs(corrs, in_corrs, n_evs: int, save_path: Optional[str] = None):
    """PC-correlation diagnostic plots (reference: code/utils.py:141-214):
    per-ev correlation of consecutive timesteps' PCs, and the in-iteration
    power-method convergence correlations. Returns the two figures (saved as
    PNGs when ``save_path`` is given)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    corrs = np.asarray(corrs) if len(corrs) else np.zeros((0, n_evs))
    fig1, ax = plt.subplots()
    for ev in range(n_evs):
        if corrs.shape[0]:
            ax.plot(corrs[:, ev], label=f"PC {ev + 1}")
    ax.set_xlabel("timestep index")
    ax.set_ylabel("corr with previous timestep's PC")
    ax.set_ylim(-1.05, 1.05)
    ax.legend()
    fig1.tight_layout()

    fig2, ax2 = plt.subplots()
    in_corrs = np.asarray(in_corrs) if len(in_corrs) else np.zeros((0, 1, n_evs))
    if in_corrs.size:
        mean_conv = in_corrs.mean(axis=0)  # (iters-1, n_ev)
        for ev in range(min(n_evs, mean_conv.shape[-1])):
            ax2.plot(mean_conv[:, ev], label=f"PC {ev + 1}")
    ax2.set_xlabel("power iteration")
    ax2.set_ylabel("mean successive-iterate corr")
    ax2.legend()
    fig2.tight_layout()

    if save_path is not None:
        fig1.savefig(os.path.join(save_path, "pc_corrs.png"))
        fig2.savefig(os.path.join(save_path, "pc_in_corrs.png"))
    plt.close(fig1)
    plt.close(fig2)
    return fig1, fig2


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
