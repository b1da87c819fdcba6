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


def apply_platform_override() -> None:
    """Honor AEC_PLATFORM=cpu|tpu: the ambient JAX_PLATFORMS env var is
    overridden by preloaded TPU plugins (axon), so CPU runs need an
    in-process config update — which must land before ANY backend
    initialization. Every CLI entry point calls this first."""
    platform = os.environ.get("AEC_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


def set_reproducibility(seed: Optional[int]):
    """Seed host RNGs; returns the JAX PRNG seed to use (random if None).

    Also applies the AEC_PLATFORM override (see apply_platform_override —
    must precede the cache setup and any backend touch) and enables the
    persistent compilation cache (utils/jax_setup.py)."""
    apply_platform_override()

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
    """Open a wandb run mirroring the reference's surface: project "AudInv",
    name falling back to the output basename, group/job_type, and
    config.update(args) (reference: main_run.py:96-102,
    main_pc_extract_inv.py:85-92). Returns the wandb module (log through it)
    or a no-op stub when disabled/unavailable."""
    if getattr(args, "wandb_disable", True):
        return WandbStub()
    try:
        import wandb
    except ImportError:
        print("[!] wandb not installed; logging disabled")
        return WandbStub()
    mode = os.environ.get("WANDB_MODE", "online")
    wandb.init(project="AudInv", config={},
               name=getattr(args, "wandb_name", None) or name,
               group=getattr(args, "wandb_group", None),
               job_type=job_type, mode=mode)
    wandb.config.update(vars(args))
    return wandb


def log_edit_artifacts(wandb, name: str, sr: int,
                       orig_audio: np.ndarray, gen_audio: np.ndarray,
                       orig_spec: Optional[np.ndarray] = None,
                       gen_spec: Optional[np.ndarray] = None) -> None:
    """Log the reference's per-edit artifact set: original + generated audio
    and their spectrograms (reference: main_run.py:226-231)."""
    if isinstance(wandb, WandbStub):
        return
    d = {
        "orig": wandb.Audio(np.asarray(orig_audio).squeeze(), caption="orig",
                            sample_rate=sr),
        "gen": wandb.Audio(np.asarray(gen_audio).squeeze(), caption=name,
                           sample_rate=sr),
    }
    if orig_spec is not None:
        d["orig_spec"] = wandb.Image(np.asarray(orig_spec), caption="orig")
    if gen_spec is not None:
        d["gen_spec"] = wandb.Image(np.asarray(gen_spec), caption=name)
    wandb.log(d)


def log_pc_corrs(wandb, corrs, in_corrs, eigvals, n_evs: int) -> None:
    """Log PC-extraction diagnostics: per-PC eigenvalues and the power-method
    convergence correlations (reference: main_pc_extract_inv.py:222-231 logs
    per-iteration wandb.plot.line tables + eigvals)."""
    if isinstance(wandb, WandbStub):
        return
    corrs = np.asarray(corrs) if len(corrs) else np.zeros((0, n_evs))
    in_corrs = np.asarray(in_corrs) if len(in_corrs) else np.zeros((0, 1, n_evs))
    eigvals = np.asarray(eigvals) if len(eigvals) else np.zeros((0, n_evs))
    for ev in range(n_evs):
        if in_corrs.size:
            mean_conv = in_corrs.mean(axis=0)
            table = wandb.Table(
                data=[[int(i), float(c)] for i, c in enumerate(mean_conv[:, ev])],
                columns=["iter", "corr"])
            wandb.log({f"in_corr_{ev}": wandb.plot.line(
                table, "iter", "corr",
                title=f"Subspace iteration correlations #PC {ev}")})
    # One wandb.log per iteration carrying ALL evs' eigenvalues, with the
    # iteration as a DATA FIELD rather than step=: wandb drops log calls
    # whose step goes backwards, and the in_corr plot logs above already
    # advanced the run's auto-step past 0, so any explicit step=it restart
    # would silently discard the first iterations. define_metric binds the
    # default charts to eigval_iter so they render against the iteration.
    if eigvals.size:
        try:
            wandb.define_metric("eigval_*", step_metric="eigval_iter")
        except AttributeError:  # older wandb without define_metric
            pass
        for it in range(eigvals.shape[0]):
            row = {f"eigval_{ev}": float(eigvals[it, ev])
                   for ev in range(n_evs)}
            row["eigval_iter"] = it
            wandb.log(row)
    if corrs.size:
        fig1, _ = plot_corrs(corrs, in_corrs, n_evs)
        wandb.log({"pc_corrs": wandb.Image(fig1)})


def dump_run_summary(save_path: str, args, extra=None) -> None:
    """Machine-readable run record alongside the artifacts (supplements the
    reference's filename-as-config convention, evals/utils.py:269-287)."""
    payload = {k: v for k, v in vars(args).items() if not k.startswith("_")}
    payload = {k: (v.tolist() if isinstance(v, np.ndarray) else v) for k, v in payload.items()}
    if extra:
        payload.update(extra)
    with open(os.path.join(save_path, "run_args.json"), "w") as f:
        json.dump(payload, f, indent=2, default=str)
