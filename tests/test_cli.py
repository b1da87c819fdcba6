"""CLI smoke tests on the tiny model: every tool runs end-to-end and writes
the reference-compatible artifact tree."""

import glob
import os

import numpy as np
import pytest

from audioeditingcode_tpu.utils.audio_io import write_wav


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    sr = 16000
    t = np.arange(sr // 4, dtype=np.float32) / sr
    wave = 0.4 * np.sin(2 * np.pi * 330 * t)
    p = str(tmp_path_factory.mktemp("aud") / "clip.wav")
    write_wav(p, wave[None], sr)
    return p


@pytest.mark.slow
def test_main_run_ours(wav_file, tmp_path):
    from audioeditingcode_tpu.cli.run import main

    out = main([
        "--model_id", "test/tiny-audioldm",
        "--init_aud", wav_file,
        "--target_prompt", "a trumpet",
        "--source_prompt", "a sine tone",
        "--num_diffusion_steps", "6",
        "--tstart", "4",
        "--cfg_src", "3", "--cfg_tar", "6",
        "--results_path", str(tmp_path / "results"),
        "--seed", "0",
    ])
    assert os.path.exists(out)
    d = os.path.dirname(out)
    assert os.path.exists(os.path.join(d, "orig.wav"))
    assert glob.glob(os.path.join(d, "*.png"))
    assert "skip_2" in os.path.basename(out)


def test_main_run_profile_dir_writes_trace(wav_file, tmp_path):
    """--profile_dir captures a jax.profiler trace around the edit
    (SURVEY §5: tracing is greenfield TPU tooling this framework adds)."""
    from audioeditingcode_tpu.cli.run import main

    prof = tmp_path / "prof"
    out = main([
        "--model_id", "test/tiny-audioldm",
        "--init_aud", wav_file,
        "--target_prompt", "a trumpet",
        "--num_diffusion_steps", "4",
        "--tstart", "3",
        "--results_path", str(tmp_path / "results"),
        "--seed", "0",
        "--profile_dir", str(prof),
    ])
    assert os.path.exists(out)
    traces = glob.glob(os.path.join(str(prof), "**", "*.xplane.pb"),
                       recursive=True)
    assert traces, f"no profiler trace written under {prof}"


def test_main_run_selfcheck(wav_file, tmp_path):
    """--selfcheck reverses with the SOURCE conditioning and must
    reconstruct the recorded trajectory start near-exactly (the reference's
    commented-out consistency checks, inversion_utils.py:127,305, made
    first-class)."""
    import json

    from audioeditingcode_tpu.cli.run import main

    out = main([
        "--model_id", "test/tiny-audioldm",
        "--init_aud", wav_file,
        "--target_prompt", "a trumpet",
        "--source_prompt", "a sine tone",
        "--num_diffusion_steps", "6",
        "--tstart", "4",
        "--results_path", str(tmp_path / "results"),
        "--seed", "0",
        "--selfcheck",
    ])
    assert os.path.basename(out).startswith("selfcheck_")
    with open(os.path.join(os.path.dirname(out), "run_args.json")) as f:
        summary = json.load(f)
    assert summary["selfcheck_snr_db"] >= 40.0


def test_main_run_ddim(wav_file, tmp_path):
    from audioeditingcode_tpu.cli.run import main

    out = main([
        "--model_id", "test/tiny-audioldm",
        "--init_aud", wav_file,
        "--target_prompt", "a violin",
        "--num_diffusion_steps", "6",
        "--tstart", "6",
        "--mode", "ddim",
        "--results_path", str(tmp_path / "results"),
        "--seed", "0",
    ])
    assert os.path.exists(out)


def test_sdedit(wav_file, tmp_path):
    from audioeditingcode_tpu.cli.sdedit import main

    out = main([
        "--model_id", "test/tiny-audioldm",
        "--init_aud", wav_file,
        "--target_prompt", "a drum",
        "--num_diffusion_steps", "6",
        "--tstart", "4",
        "--results_path", str(tmp_path / "sdedit"),
        "--seed", "1",
        "--wandb_disable",
    ])
    assert os.path.exists(out)


@pytest.mark.slow
def test_pc_extract_and_apply(wav_file, tmp_path):
    from audioeditingcode_tpu.cli.pc_extract import main as extract
    from audioeditingcode_tpu.cli.pc_apply import main as apply_main

    ckpt = extract([
        "--model_id", "test/tiny-audioldm",
        "--init_aud", wav_file,
        "--num_diffusion_steps", "6",
        "--drift_start", "4", "--drift_end", "2",
        "--iters", "5",
        "--n_evs", "2",
        "--results_path", str(tmp_path / "pc"),
        "--seed", "2",
        "--wandb_disable",
    ])
    assert os.path.exists(ckpt)

    outs = apply_main([
        "--extraction_path", ckpt,
        "--drift_start", "4", "--drift_end", "2",
        "--amount", "1.5",
        "--evs", "1", "2",
        "--seed", "2",
        "--wandb_disable",
    ])
    for o in outs:
        assert os.path.exists(o)

    # combined evs + rand_v baseline
    outs2 = apply_main([
        "--extraction_path", ckpt,
        "--drift_start", "4", "--drift_end", "2",
        "--amount", "1.0",
        "--evs", "1", "2",
        "--combine_evs",
        "--rand_v",
        "--seed", "3",
        "--wandb_disable",
    ])
    assert os.path.exists(outs2[0])
    assert "_RAND" in outs2[0]


@pytest.mark.slow
def test_pc_extract_ts_chunk_matches_sequential(wav_file, tmp_path):
    """--ts_chunk batches independent timesteps' power iterations into one
    vmapped program; results must match the sequential path (same RNG split
    order), including the padded tail chunk."""
    import numpy as np

    from audioeditingcode_tpu.cli.pc_extract import main as extract
    from audioeditingcode_tpu.editing.pcdata import load_extraction

    base = [
        "--model_id", "test/tiny-audioldm",
        "--init_aud", wav_file,
        "--num_diffusion_steps", "6",
        "--drift_start", "5", "--drift_end", "2",  # 3-timestep window
        "--iters", "3",
        "--n_evs", "2",
        "--seed", "7",
        "--wandb_disable",
    ]
    seq = load_extraction(extract(
        base + ["--results_path", str(tmp_path / "seq")])[: -len(".npz")])
    chk = load_extraction(extract(
        base + ["--results_path", str(tmp_path / "chk"), "--ts_chunk", "2"]
    )[: -len(".npz")])

    assert list(seq["eig_ts"]) == list(chk["eig_ts"])
    np.testing.assert_allclose(seq["eig_vecs"], chk["eig_vecs"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(seq["eig_vals"], chk["eig_vals"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(seq["xts"], chk["xts"], rtol=1e-5, atol=1e-6)


def test_main_run_audioldm2_dual_stream(tmp_path, wav_file):
    """Dual-cross-attention family end-to-end through the edit CLI."""
    from audioeditingcode_tpu.cli import run

    out = run.main([
        "--model_id", "test/tiny-audioldm2", "--init_aud", wav_file,
        "--target_prompt", "a trumpet", "--source_prompt", "a piano",
        "--num_diffusion_steps", "5", "--tstart", "3",
        "--results_path", str(tmp_path / "r2"), "--seed", "0",
    ])
    import os
    assert os.path.exists(out)


def test_main_run_multi_prompt_tstart(tmp_path, wav_file):
    """Multi-prompt spatial CFG with per-prompt tstart and cutoff points
    (the reference's multi-tstart mask-fix path, inversion_utils.py:307-315)."""
    from audioeditingcode_tpu.cli import run

    out = run.main([
        "--model_id", "test/tiny-audioldm", "--init_aud", wav_file,
        "--target_prompt", "a trumpet", "a violin",
        "--tstart", "4", "3",
        "--cfg_tar", "6", "8",
        "--cutoff_points", "0.5",
        "--num_diffusion_steps", "5",
        "--results_path", str(tmp_path / "mp"), "--seed", "0",
    ])
    import os
    assert os.path.exists(out)
