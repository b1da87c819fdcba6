"""Evaluation runner CLI.

Script form of the reference's evaluation notebooks (evals/SupEval.ipynb —
windowed CLAP/LPAPS sweep tables; evals/UnsupEval.ipynb — FAD of generation
directories against originals / an external reference set). Emits tidy CSVs.
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Compute CLAP/LPAPS/FAD scores")
    p.add_argument("--ours_dirs", type=str, nargs="*", default=[],
                   help="result roots at the <model> level (cli/run.py layout)")
    p.add_argument("--sdedit_dirs", type=str, nargs="*", default=[])
    p.add_argument("--ddim_dirs", type=str, nargs="*", default=[])
    p.add_argument("--musicgen_dirs", type=str, nargs="*", default=[],
                   help="MusicGen baseline roots: <root>/<input>/"
                        "prompt_<target prompt>.wav (reference "
                        "evals/utils.py:211-216)")
    p.add_argument("--musicgen_large_dirs", type=str, nargs="*", default=[],
                   help="MusicGen-large baseline roots (same layout)")
    p.add_argument("--inputs_orig", type=str, default=None,
                   help="directory of original input wavs (else sibling orig.wav)")
    p.add_argument("--fad_gen_dir", type=str, default=None,
                   help="generation dir for FAD")
    p.add_argument("--fad_gen_dirs", type=str, nargs="*", default=[],
                   metavar="SKIP=DIR",
                   help="per-skip generation dirs (e.g. 150=out/skip150) "
                        "for the UnsupEval FAD-vs-FAD sweep table/scatter")
    p.add_argument("--fad_ref_dirs", type=str, nargs="*", default=[],
                   help="reference dirs for FAD (e.g. originals, FMA-pop); "
                        "the FIRST is treated as the originals axis of the "
                        "scatter (reference UnsupEval.ipynb cell 16)")
    p.add_argument("--clap_model", type=str, default=None,
                   help="HF id/path of a CLAP checkpoint; defaults to the "
                        "reference LPAPS/consistency protocol checkpoint "
                        "(laion/larger_clap_music_and_speech, the "
                        "transformers port of "
                        "music_speech_epoch_15_esc_89.25.pt)")
    p.add_argument("--clap_backend", type=str, default="jax",
                   choices=["jax", "torch"],
                   help="run the CLAP audio tower on JAX/TPU or the torch oracle")
    p.add_argument("--allow_mel_fallback", action="store_true",
                   help="if the CLAP checkpoint is unreachable, knowingly "
                        "fall back to the weight-free, NON-perceptual mel "
                        "extractor instead of erroring (scores are then "
                        "not protocol-comparable)")
    p.add_argument("--prev_pt", type=str, default=None,
                   help="scores checkpoint (resume support)")
    p.add_argument("--win_length", type=float, default=None)
    p.add_argument("--overlap", type=float, default=0.1)
    p.add_argument("--method", type=str, default="mean",
                   choices=["mean", "median", "max", "min"])
    p.add_argument("--out_dir", type=str, default="eval_scores")
    p.add_argument("--plots", action="store_true",
                   help="render the notebook figures next to the CSVs: "
                        "CLAP-vs-LPAPS trade-off curves per sweep dim "
                        "(SupEval cells 10-14) and the FAD scatter "
                        "(UnsupEval cell 16)")
    p.add_argument("--total_steps", type=int, default=200,
                   help="diffusion steps of the evaluated runs; used only "
                        "to annotate plot points with tstart = steps - skip")
    return p


def _ref_name(i: int, ref_dir: str) -> str:
    """Column name for a FAD reference set: the first --fad_ref_dirs entry
    is the originals axis (`orig`), others keep their directory name."""
    if i == 0:
        return "orig"
    return os.path.basename(os.path.normpath(ref_dir)) or f"ref{i}"


def _ref_names(ref_dirs) -> list:
    """Unique column names for --fad_ref_dirs. Two reference dirs sharing a
    basename (e.g. runA/refs and runB/refs) get index-suffixed names instead
    of silently overwriting each other's (expensive) scores in the table."""
    names = []
    for i, ref in enumerate(ref_dirs):
        name = _ref_name(i, ref)
        if name in names:
            name = f"{name}#{i}"
        names.append(name)
    return names


def _bind_fad_scorer(args, extractor):
    """FAD scorer bound to the reference protocol: the fadtk
    clap-laion-music checkpoint (reference evals/fadtk_utils.py:33-59)
    unless an explicit --clap_model overrides it. Returns
    (scorer, extractor) so an extractor built here is reused — the
    --fad_gen_dirs and --fad_gen_dir blocks share one binding instead of
    loading the CLAP model twice. (Imports stay local: main() applies the
    platform override before any backend-touching import.)"""
    from ..evals import FADScorer
    from ..evals.features import default_extractor, fad_extractor

    if args.clap_model:
        if extractor is None:
            extractor = default_extractor(
                args.clap_model, backend=args.clap_backend,
                allow_mel_fallback=args.allow_mel_fallback)
        fad_ext = extractor
    else:
        fad_ext = fad_extractor(backend=args.clap_backend,
                                allow_mel_fallback=args.allow_mel_fallback)
    scorer = FADScorer(fad_ext, window_size_s=args.win_length or 10.0,
                       overlap=args.overlap)
    return scorer, extractor


def main(argv=None):
    args = build_parser().parse_args(argv)
    # evaluation is offline work: honor AEC_PLATFORM=cpu before any backend
    # touch (without this the preloaded TPU plugin wins and a CPU-side
    # scoring run silently compiles through the remote tunnel)
    from .common import apply_platform_override

    apply_platform_override()
    from ..evals import FADScorer, calc_scores, combine_scores
    from ..evals.features import default_extractor

    os.makedirs(args.out_dir, exist_ok=True)
    outputs = []
    extractor = None  # LPAPS/consistency extractor, built only when needed:
    # a FAD-only invocation must not load (or hard-error on) the unrelated
    # LPAPS protocol checkpoint — FAD has its own protocol binding below.

    if (args.ours_dirs or args.sdedit_dirs or args.ddim_dirs
            or args.musicgen_dirs or args.musicgen_large_dirs):
        extractor = default_extractor(
            args.clap_model, backend=args.clap_backend,
            allow_mel_fallback=args.allow_mel_fallback)
        state = calc_scores(
            extractor,
            ours_dirs=args.ours_dirs,
            sdedit_dirs=args.sdedit_dirs,
            ddim_dirs=args.ddim_dirs,
            musicgen_dirs=args.musicgen_dirs,
            musicgen_large_dirs=args.musicgen_large_dirs,
            inputs_orig=args.inputs_orig,
            prev_pt=args.prev_pt,
            win_length=args.win_length,
            overlap=args.overlap,
            method=args.method,
        )
        dfs = combine_scores(state)
        for name, df in dfs.items():
            out = os.path.join(args.out_dir, f"scores_{name}.csv")
            df.to_csv(out, index=False)
            outputs.append(out)
            print(f"[+] wrote {out} ({len(df)} rows)")
        if len(dfs) > 1:
            # side-by-side method table (the paper's supervised comparison
            # incl. MusicGen baseline columns — evals/SupEval.ipynb)
            from ..evals.scores import method_comparison_table

            out = os.path.join(args.out_dir, "method_comparison.csv")
            method_comparison_table(dfs).to_csv(out, index=False)
            outputs.append(out)
            print(f"[+] wrote {out}")
        if args.plots and dfs:
            from ..evals.figures import save_eval_figures

            for fig_path in save_eval_figures(dfs, args.out_dir,
                                              total_steps=args.total_steps):
                outputs.append(fig_path)
                print(f"[+] wrote {fig_path}")

    fad_scorer = None
    if args.fad_gen_dirs:
        from ..evals.scores import unsupervised_fad_table

        if not args.fad_ref_dirs:
            raise SystemExit("--fad_gen_dirs needs --fad_ref_dirs")
        fad_scorer, extractor = _bind_fad_scorer(args, extractor)
        ref_names = _ref_names(args.fad_ref_dirs)
        by_skip = {}
        for spec in args.fad_gen_dirs:
            skip_s, _, gen_dir = spec.partition("=")
            if not gen_dir or not skip_s.isdigit():
                raise SystemExit(f"--fad_gen_dirs wants SKIP=DIR, got {spec!r}")
            skip = int(skip_s)
            if skip in by_skip:
                # overwriting would silently discard the already-computed
                # (expensive) FAD scores for this skip
                raise SystemExit(f"--fad_gen_dirs has skip {skip} twice")
            by_skip[skip] = {
                name: fad_scorer.score_dirs(gen_dir, ref)
                for name, ref in zip(ref_names, args.fad_ref_dirs)}
        fad_df = unsupervised_fad_table(by_skip)
        out = os.path.join(args.out_dir, "fad_by_skip.csv")
        fad_df.to_csv(out, index=False)
        outputs.append(out)
        print(f"[+] wrote {out}")
        if args.plots:
            from ..evals.figures import save_eval_figures

            for fig_path in save_eval_figures({}, args.out_dir,
                                              fad_df=fad_df,
                                              total_steps=args.total_steps):
                outputs.append(fig_path)
                print(f"[+] wrote {fig_path}")

    if args.fad_gen_dir:
        import json

        if fad_scorer is None:
            fad_scorer, extractor = _bind_fad_scorer(args, extractor)
        fads = {ref: fad_scorer.score_dirs(args.fad_gen_dir, ref)
                for ref in args.fad_ref_dirs}
        out = os.path.join(args.out_dir, "fad.json")
        with open(out, "w") as f:
            json.dump(fads, f, indent=2)
        outputs.append(out)
        print(f"[+] wrote {out}: {fads}")

    return outputs


if __name__ == "__main__":
    main()
