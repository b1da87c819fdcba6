"""Eval figures — script form of the reference notebooks' plots.

The reference renders its two headline evaluation figures by hand inside
notebooks: the CLAP-vs-LPAPS trade-off curves per method across the
skip/tarcfg/srccfg sweeps (reference evals/SupEval.ipynb cells 10-14) and
the FAD-to-original vs FAD-to-reference-set scatter across skips
(reference evals/UnsupEval.ipynb cell 16). This module renders the same
figures from the tidy score tables `evals/scores.py` emits, so
`main_evals.py --plots` writes them next to the score CSVs instead of
requiring a notebook session.

Axis semantics (both inherited from the reference): CLAP similarity to the
target prompt on x (higher = better edit adherence), LPAPS distance to the
source on y (lower = better source consistency); sweep points are
annotated with tstart = total_steps - skip, matching the notebook labels.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

# Per-method marker/line styling (mirrors the notebook's lane identities).
_METHOD_STYLE = {
    "ours": dict(marker="*", markersize=10, linewidth=2),
    "sdedit": dict(marker="o", markersize=7, linewidth=1.5),
    "ddim": dict(marker="s", markersize=6, linewidth=1.5),
    "musicgen": dict(marker="D", markersize=8),
    "musicgen-large": dict(marker="P", markersize=9),
    "orig": dict(marker="v", markersize=7),
}
_SWEEP_DIMS = ("skip", "tarcfg", "srccfg")


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _dominant(df, col):
    """Most frequent value of a sweep column (the data-driven analogue of
    the notebook's hardcoded srccfg=3 / tarcfg=12 reference defaults)."""
    if col not in df.columns:
        return None
    vals = df[col].dropna()
    if not len(vals):
        return None
    return vals.mode().iloc[0]


def _curve(df, sweep, fixed):
    """Aggregate (sweep_value, mean clap, mean lpaps), filtered to the
    fixed values of the other sweep dims — SupEval's per-curve selection."""
    sel = df
    for col, val in fixed.items():
        if col in sel.columns and val is not None:
            sel = sel[np.isclose(sel[col].astype(float), float(val))]
    if sweep not in sel.columns or not len(sel):
        return None
    sel = sel.dropna(subset=[sweep])
    if not len(sel):
        return None
    agg = (sel.groupby(sweep)[["clap", "lpaps"]].mean()
           .reset_index().sort_values(sweep))
    return agg


def _is_flat(df, sweep):
    """A lane with no sweep column (MusicGen baselines) plots as a point."""
    return (sweep not in df.columns or df[sweep].dropna().nunique() <= 1)


def tradeoff_figure(dfs: Dict[str, "object"], sweep: str = "skip",
                    fixed: Optional[dict] = None, total_steps: int = 200):
    """CLAP-vs-LPAPS trade-off figure for one sweep dimension.

    dfs: {method: tidy df with clap/lpaps (+ skip/tarcfg/srccfg where the
    lane has them)}. Flat lanes render as single points. Returns the
    matplotlib Figure (caller saves/closes)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 6))
    plotted = 0
    for method, df in dfs.items():
        if df is None or not len(df):
            continue
        style = _METHOD_STYLE.get(method, dict(marker="^", markersize=6))
        if _is_flat(df, sweep):
            ax.plot(df["clap"].mean(), df["lpaps"].mean(), linestyle="none",
                    label=method, **style)
            plotted += 1
            continue
        own_fixed = {c: (fixed or {}).get(c, _dominant(df, c))
                     for c in _SWEEP_DIMS if c != sweep}
        curve = _curve(df, sweep, own_fixed)
        if curve is None or not len(curve):
            continue
        ax.plot(curve["clap"], curve["lpaps"], label=method, **style)
        for _, row in curve.iterrows():
            v = row[sweep]
            label = (f"{int(total_steps - v)}" if sweep == "skip"
                     else f"{v:g}")
            ax.annotate(label, (row["clap"], row["lpaps"]),
                        textcoords="offset points", xytext=(5, 4),
                        fontsize=8)
        plotted += 1
    if not plotted:
        plt.close(fig)
        return None
    ax.set_xlabel("CLAP similarity to target prompt (higher is better)")
    ax.set_ylabel("LPAPS distance to source (lower is better)")
    name = {"skip": f"tstart sweep (labels = tstart of {total_steps})",
            "tarcfg": "target-CFG sweep",
            "srccfg": "source-CFG sweep"}[sweep]
    ax.set_title(f"Edit fidelity trade-off — {name}")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    return fig


def fad_scatter_figure(fad_df, x_col: str = "orig",
                       y_col: Optional[str] = None,
                       total_steps: int = 200, label: str = "generated"):
    """FAD-to-original (x) vs FAD-to-reference-set (y) across skips —
    reference evals/UnsupEval.ipynb cell 16. fad_df is
    `scores.unsupervised_fad_table` output: a `skip` column plus one column
    per reference set."""
    if fad_df is None or not len(fad_df) or x_col not in fad_df.columns:
        return None
    if y_col is None:
        y_col = next((c for c in fad_df.columns
                      if c not in ("skip", x_col)), None)
    if y_col is None:
        return None
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 5))
    df = fad_df.sort_values("skip")
    ax.plot(df[x_col], df[y_col], marker="o", markersize=9, linewidth=2,
            label=label)
    for _, row in df.iterrows():
        ax.annotate(f"{int(total_steps - row['skip'])}",
                    (row[x_col], row[y_col]),
                    textcoords="offset points", xytext=(6, -4), fontsize=8)
    ax.set_xlabel(f"FAD to original recordings ({x_col})")
    ax.set_ylabel(f"FAD to reference set ({y_col})")
    ax.set_title(f"Unsupervised editing FAD trade-off "
                 f"(labels = tstart of {total_steps})")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    return fig


def save_eval_figures(dfs, out_dir: str, fad_df=None,
                      total_steps: int = 200) -> list:
    """Render every producible figure into out_dir; returns written paths.

    One trade-off PNG per sweep dimension that actually varies in the
    'ours' lane (SupEval cells 10/12/14), plus the FAD scatter when a
    per-skip FAD table is given (UnsupEval cell 16)."""
    plt = _plt()
    written = []
    ours = dfs.get("ours") if dfs else None
    for sweep in _SWEEP_DIMS:
        has_sweep = (ours is not None and len(ours)
                     and not _is_flat(ours, sweep))
        if not has_sweep and sweep != "skip":
            continue  # cfg sweeps are meaningless without variation
        fig = tradeoff_figure(dfs, sweep=sweep, total_steps=total_steps)
        if fig is None:
            continue
        path = os.path.join(out_dir, f"tradeoff_{sweep}.png")
        fig.savefig(path, dpi=120)
        plt.close(fig)
        written.append(path)
    if fad_df is not None:
        fig = fad_scatter_figure(fad_df, total_steps=total_steps)
        if fig is not None:
            path = os.path.join(out_dir, "fad_scatter.png")
            fig.savefig(path, dpi=120)
            plt.close(fig)
            written.append(path)
    return written
