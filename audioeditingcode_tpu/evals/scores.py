"""Score orchestration over result-directory trees.

Rebuild of the reference's ``calc_scores`` / ``combine_scores``
(reference: evals/utils.py:119-411, 466+): walk the CLI result layout,
parse the config back out of file names with the same regexes
(``_skip_(\\d+)_``, ``_cfg_d_(\\d+).0_``, ``cfg_e_(\\d+\\.\\d+)_`` —
evals/utils.py:269-287), compute windowed CLAP consistency and LPAPS per
generation, checkpoint incrementally, and emit tidy pandas DataFrames.

Directory layout produced by the CLIs (cli/run.py, cli/sdedit.py):

  ours:   <root>/<model>/<input>/src_<src>/dec_<tar>__neg__<neg>/cfg_e_.._cfg_d_.._skip_.._<ts>.wav
  sdedit: <root>/<model>/<input>/pmt_<tar>__neg__<neg>/s<seed>_skip<skip>_cfg<cfg>.wav
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional


from ..utils.audio_io import read_wav
from .clap_consistency import CLAPTextConsistencyMetric
from .lpaps import LPAPS

_SKIP_RE = re.compile(r"_skip_(\d+)_")
_TARCFG_RE = re.compile(r"_cfg_d_(\d+)\.0_")
_SRCCFG_RE = re.compile(r"cfg_e_(\d+\.\d+)_")
_SDEDIT_RE = re.compile(r"s(?:\d+|None)_skip(\d+)_cfg(\d+(?:\.\d+)?)")


def _unmangle(s: str) -> str:
    return s.replace("_", " ")


@dataclass
class ScoreRecord:
    method: str
    audio_input: str
    source_prompt: str
    target_prompt: str
    skip: Optional[int] = None
    tarcfg: Optional[float] = None
    srccfg: Optional[float] = None
    clap: Optional[float] = None
    lpaps: Optional[float] = None
    path: str = ""

    def key(self) -> str:
        return "|".join(str(x) for x in (
            self.method, self.audio_input, self.source_prompt,
            self.target_prompt, self.skip, self.tarcfg, self.srccfg,
        ))


@dataclass
class ScoreState:
    records: Dict[str, ScoreRecord] = field(default_factory=dict)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({k: vars(r) for k, r in self.records.items()}, f)

    @classmethod
    def load(cls, path: str) -> "ScoreState":
        st = cls()
        if os.path.exists(path):
            with open(path) as f:
                st.records = {k: ScoreRecord(**v) for k, v in json.load(f).items()}
        return st


def _iter_ours(ours_root: str):
    """Yield (audio_input, src, tar, skip, tarcfg, srccfg, wav_path)."""
    for audio_input in sorted(os.listdir(ours_root)):
        inp_dir = os.path.join(ours_root, audio_input)
        if not os.path.isdir(inp_dir):
            continue
        for src_dir in sorted(os.listdir(inp_dir)):
            if not src_dir.startswith("src_"):
                continue
            src = _unmangle(src_dir[4:])
            for tar_dir in sorted(os.listdir(os.path.join(inp_dir, src_dir))):
                tar = _unmangle(tar_dir[4:].split("__neg__")[0])
                inner = os.path.join(inp_dir, src_dir, tar_dir)
                for f in sorted(os.listdir(inner)):
                    if not f.endswith(".wav") or f.startswith("orig"):
                        continue
                    skip_m = _SKIP_RE.search(f)
                    tarcfg_m = _TARCFG_RE.search(f)
                    srccfg_m = _SRCCFG_RE.search(f)
                    yield (
                        audio_input, src, tar,
                        int(skip_m.group(1)) if skip_m else None,
                        float(tarcfg_m.group(1)) if tarcfg_m else None,
                        float(srccfg_m.group(1)) if srccfg_m else None,
                        os.path.join(inner, f),
                    )


def _iter_musicgen(root: str):
    """MusicGen baseline lane (reference: evals/utils.py:211-216, 340-361):
    ``<root>/<audio_input>/prompt_<target prompt>.wav`` — one flat
    generation per (input, target prompt), no skip/cfg dimensions. The
    reference keys files by ``x[7:-4]`` (strip a 7-char prefix + '.wav',
    prompt kept verbatim with spaces); mirrored exactly here."""
    for audio_input in sorted(os.listdir(root)):
        inp_dir = os.path.join(root, audio_input)
        if not os.path.isdir(inp_dir):
            continue
        for f in sorted(os.listdir(inp_dir)):
            # only 'prompt_*.wav' files belong to the lane — the [7:-4]
            # slice is meaningless on stray wavs (e.g. a copied input),
            # which would otherwise score against a garbage prompt
            # (build_demo_page.scan_musicgen applies the same filter)
            if not f.endswith(".wav") or not f.startswith("prompt_"):
                continue
            tar = f[7:-4]
            yield (audio_input, "", tar, None, None, None,
                   os.path.join(inp_dir, f))


def _iter_sdedit(root: str):
    for audio_input in sorted(os.listdir(root)):
        inp_dir = os.path.join(root, audio_input)
        if not os.path.isdir(inp_dir):
            continue
        for pmt_dir in sorted(os.listdir(inp_dir)):
            if not pmt_dir.startswith("pmt_"):
                continue
            tar = _unmangle(pmt_dir[4:].split("__neg__")[0])
            inner = os.path.join(inp_dir, pmt_dir)
            for f in sorted(os.listdir(inner)):
                if not f.endswith(".wav") or f.startswith("orig"):
                    continue
                m = _SDEDIT_RE.search(f)
                if not m:
                    continue
                yield (audio_input, "", tar, int(m.group(1)),
                       float(m.group(2)), None, os.path.join(inner, f))


def calc_scores(
    extractor,
    ours_dirs: Optional[List[str]] = None,
    sdedit_dirs: Optional[List[str]] = None,
    ddim_dirs: Optional[List[str]] = None,
    musicgen_dirs: Optional[List[str]] = None,
    musicgen_large_dirs: Optional[List[str]] = None,
    inputs_orig: Optional[str] = None,
    prev_pt: Optional[str] = None,
    win_length: Optional[float] = None,
    overlap: float = 0.1,
    method: str = "mean",
    verbose: bool = True,
) -> ScoreState:
    """Compute windowed CLAP + LPAPS for every generation found.

    Resumable: pass ``prev_pt`` to reuse previously computed records
    (reference: evals/utils.py:173-184). LPAPS is measured against the
    original input wav from ``inputs_orig`` (or the sibling orig.wav)."""
    clap = CLAPTextConsistencyMetric(extractor)
    lpaps = LPAPS(extractor)
    state = ScoreState.load(prev_pt) if prev_pt else ScoreState()

    orig_cache: Dict[str, tuple] = {}

    def orig_for(audio_input: str, gen_path: str):
        if audio_input in orig_cache:
            return orig_cache[audio_input]
        path = None
        if inputs_orig is not None:
            cand = os.path.join(inputs_orig, audio_input + ".wav")
            if os.path.exists(cand):
                path = cand
        if path is None:
            cand = os.path.join(os.path.dirname(gen_path), "orig.wav")
            if os.path.exists(cand):
                path = cand
        if path is None:
            orig_cache[audio_input] = None
            return None
        aud, sr = read_wav(path)
        orig_cache[audio_input] = (aud, sr)
        return orig_cache[audio_input]

    def process(method_name: str, items):
        for audio_input, src, tar, skip, tarcfg, srccfg, path in items:
            rec = ScoreRecord(method_name, audio_input, src, tar,
                              skip, tarcfg, srccfg, path=path)
            if rec.key() in state.records and \
                    state.records[rec.key()].clap is not None:
                continue
            aud, sr = read_wav(path)
            rec.clap = clap.windowed(aud, sr, tar, win_length, overlap, method)
            orig = orig_for(audio_input, path)
            if orig is not None:
                rec.lpaps = lpaps.windowed(aud, orig[0], sr, orig[1],
                                           win_length, overlap, method)
            state.records[rec.key()] = rec
            if verbose:
                print(f"[evals] {method_name} {audio_input} '{tar}' "
                      f"clap={rec.clap:.4f} lpaps={rec.lpaps}")
            if prev_pt:
                state.save(prev_pt)

    for root in (ours_dirs or []):
        process("ours", _iter_ours(root))
    for root in (ddim_dirs or []):
        process("ddim", _iter_ours(root))
    for root in (sdedit_dirs or []):
        process("sdedit", _iter_sdedit(root))
    # MusicGen / MusicGen-large baseline lanes (reference CombinedRes
    # includes both — evals/utils.py:14-20, 123-138)
    for root in (musicgen_dirs or []):
        process("musicgen", _iter_musicgen(root))
    for root in (musicgen_large_dirs or []):
        process("musicgen_large", _iter_musicgen(root))
    if prev_pt:
        state.save(prev_pt)
    return state


def combine_scores(state: ScoreState):
    """Tidy DataFrame per method (reference: evals/utils.py combine_scores)."""
    import pandas as pd

    rows = [vars(r) for r in state.records.values()]
    df = pd.DataFrame(rows)
    return {m: g.drop(columns=["method"]).reset_index(drop=True)
            for m, g in df.groupby("method")} if len(df) else {}


def supervised_tradeoff_table(df, group_by=("skip", "tarcfg", "srccfg")):
    """CLAP-vs-LPAPS trade-off curves, aggregated over inputs/prompts per
    sweep point — the table behind evals/SupEval.ipynb cells 10-14 (mean
    CLAP and LPAPS per skip x tarcfg x srccfg)."""
    cols = [c for c in group_by if c in df.columns]
    agg = (df.groupby(cols, dropna=False)[["clap", "lpaps"]]
           .agg(["mean", "std", "count"]))
    agg.columns = ["_".join(c) for c in agg.columns]
    return agg.reset_index().sort_values(cols)


def method_comparison_table(dfs):
    """One tidy frame across ALL method lanes — the side-by-side comparison
    behind the paper's supervised table (reference: evals/SupEval.ipynb plots
    the ours trade-off curve against single-point MusicGen/SDEdit/DDIM
    baselines). Sweep-dimension columns (skip/tarcfg/srccfg) are kept where a
    lane has them and NaN where it doesn't (flat baselines)."""
    import pandas as pd

    parts = []
    for method, df in dfs.items():
        agg = supervised_tradeoff_table(df)
        agg.insert(0, "method", method)
        parts.append(agg)
    return (pd.concat(parts, ignore_index=True) if parts
            else pd.DataFrame(columns=["method"]))


def unsupervised_fad_table(fad_by_skip: Dict[int, Dict[str, float]]):
    """FAD-to-original vs FAD-to-reference-set scatter data per skip —
    evals/UnsupEval.ipynb cell 16. Input: {skip: {ref_name: fad}}."""
    import pandas as pd

    rows = [{"skip": skip, **refs} for skip, refs in sorted(fad_by_skip.items())]
    return pd.DataFrame(rows)
