"""Offline test of the real-weight validation runbook's ORCHESTRATION.

tools/validate_real_weights.py is the first-hour task for a
weights-capable environment (VERDICT r3 #4): download -> manifest check ->
convert -> selfcheck -> edit -> evals -> demo page. Real weights cannot be
exercised here (no network/checkpoints), so this drives the full step
chain against the synthetic-checkpoint fixtures of
test_convert_integration — every step after `fetch` runs its real code
path end-to-end on the tiny family.
"""

import os

import numpy as np
import pytest

from audioeditingcode_tpu.utils.audio_io import write_wav
from tools.validate_real_weights import build_parser, main

from test_convert_integration import (
    _mel_checkpoint,
    make_clap_text_model_dir,
    make_roberta_tokenizer_dir,
)


@pytest.fixture(scope="module")
def fake_ckpt(tmp_path_factory):
    src = str(tmp_path_factory.mktemp("src"))
    _mel_checkpoint(src, "test/tiny-audioldm")
    make_clap_text_model_dir(os.path.join(src, "text_encoder"),
                             projection_dim=32)
    make_roberta_tokenizer_dir(os.path.join(src, "tokenizer"))
    return src


@pytest.fixture()
def clip(tmp_path):
    sr = 16000
    t = np.arange(sr // 2, dtype=np.float32) / sr
    p = str(tmp_path / "clip.wav")
    write_wav(p, (0.4 * np.sin(2 * np.pi * 330 * t))[None], sr)
    return p


def test_full_chain_passes_offline(fake_ckpt, clip, tmp_path, capsys):
    rc = main([
        "--model_id", "test/tiny-audioldm", "--src", fake_ckpt,
        "--work_dir", str(tmp_path / "work"), "--audio", clip,
        "--num_diffusion_steps", "6", "--tstart", "4",
        "--target_prompt", "a trumpet", "--allow_mel_fallback",
        # tiny random-ish weights reconstruct near-perfectly; keep the
        # real 40 dB bar — a tiny model lands at 100+ dB (verify skill)
    ])
    out = capsys.readouterr().out
    assert rc == 0, out
    # fetch PASSes on --src; manifest SKIPs (no vendored manifest for the
    # tiny family); everything else PASSes
    assert "fetch: PASS" in out
    assert "manifest: SKIP" in out
    for step in ("convert", "selfcheck", "edit", "evals", "page"):
        assert f"{step}: PASS" in out, out
    work = tmp_path / "work"
    page = (work / "supp.html").read_text()
    # POPULATED, not just present: the round-4 runbook passed the model dir
    # to the page scanner and silently built an empty 'No results yet' page
    assert "No results yet" not in page and "<audio" in page
    assert any((work / "eval_scores").glob("scores_*.csv"))


def test_full_rehearsal_all_lanes(fake_ckpt, clip, tmp_path, capsys):
    """The complete offline rehearsal (VERDICT r4 #4): ONE command runs
    every runbook step with ALL THREE method lanes (ours + ddim + sdedit),
    producing eval scores, figures (main_evals --plots) and a
    fully-populated comparison supp.html whose SYNTHETIC banner makes it
    impossible to mistake for real results — proving the only missing
    ingredient for the real-weight evidence chain is weights, not
    plumbing."""
    work = tmp_path / "rehearsal"
    rc = main([
        "--model_id", "test/tiny-audioldm", "--src", fake_ckpt,
        "--work_dir", str(work), "--audio", clip,
        "--num_diffusion_steps", "6", "--tstart", "4",
        "--target_prompt", "a trumpet", "--allow_mel_fallback",
        "--methods", "ours,ddim,sdedit",
        "--banner", "SYNTHETIC WEIGHTS — plumbing rehearsal, not results",
    ])
    out = capsys.readouterr().out
    assert rc == 0, out
    for step in ("convert", "selfcheck", "edit", "evals", "page"):
        assert f"{step}: PASS" in out, out
    # all three lanes produced a wav
    assert "ours:" in out and "ddim:" in out and "sdedit:" in out
    # the page is the method-comparison layout with one column per lane,
    # a populated audio table, and the synthetic banner up top
    page = (work / "supp.html").read_text()
    assert "SYNTHETIC WEIGHTS" in page and 'class="banner"' in page
    assert "Method comparison" in page
    for lane in ("ours", "sdedit", "ddim"):
        assert f"<th>{lane}</th>" in page
    assert page.count("<audio") >= 4  # orig + three lanes
    assert "No results yet" not in page
    # eval artifacts: per-lane score CSVs and rendered figures
    scores = list((work / "eval_scores").glob("scores_*.csv"))
    assert scores, out
    figures = (list((work / "eval_scores").glob("*.png"))
               + list((work / "eval_scores").glob("**/*.png")))
    assert figures, f"--plots produced no figures: {out}"


def test_unknown_method_fails_loudly(tmp_path):
    with pytest.raises(SystemExit, match="unknown methods"):
        main(["--model_id", "x", "--work_dir", str(tmp_path),
              "--methods", "ours,bogus"])


def test_selfcheck_gate_fails_on_low_snr(fake_ckpt, clip, tmp_path, capsys):
    """A collapsed reconstruction SNR must FAIL the chain — the gate that
    catches weights/converter/schedule disagreement on real checkpoints."""
    rc = main([
        "--model_id", "test/tiny-audioldm", "--src", fake_ckpt,
        "--work_dir", str(tmp_path / "work2"), "--audio", clip,
        "--num_diffusion_steps", "6", "--tstart", "4",
        "--steps", "convert,selfcheck",
        "--min_snr_db", "100000",  # unreachable bar forces the failure path
    ])
    out = capsys.readouterr().out
    assert rc == 1
    assert "selfcheck: FAIL" in out and "SNR" in out


def test_step_subset_and_unknown_step():
    with pytest.raises(SystemExit):
        main(["--model_id", "x", "--work_dir", "/tmp/x", "--steps", "bogus"])
    args = build_parser().parse_args(
        ["--model_id", "x", "--work_dir", "/tmp/x"])
    assert args.num_diffusion_steps == 50 and args.min_snr_db == 40.0


def test_checkpoint_steps_without_fetch_need_src(tmp_path):
    """An advertised subset like --steps manifest,convert without --src must
    fail with a clear flag error up front, not a TypeError deep inside the
    checkpoint loader."""
    with pytest.raises(SystemExit, match="--src"):
        main(["--model_id", "cvssp/audioldm2-music",
              "--work_dir", str(tmp_path), "--steps", "manifest,convert"])
