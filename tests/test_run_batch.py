"""Batched multi-clip editing CLI: one vmapped edit over a directory of
clips, outputs in main_run.py's per-clip results layout."""

import os

import numpy as np
import pytest
import jax

from scipy.io import wavfile

from audioeditingcode_tpu.cli.run_batch import main


def _write_clips(d, sr, lengths, freqs):
    os.makedirs(d, exist_ok=True)
    paths = []
    for i, (n, f0) in enumerate(zip(lengths, freqs)):
        t = np.arange(n, dtype=np.float32) / sr
        p = os.path.join(d, f"clip{i}.wav")
        wavfile.write(p, sr, (0.4 * np.sin(2 * np.pi * f0 * t) * 32767).astype(np.int16))
        paths.append(p)
    return paths


@pytest.mark.slow
def test_batch_edit_directory_mel(tmp_path):
    """Three clips of different lengths edit in one vmapped program; each
    lands in its own main_run.py-style results dir, cropped to its length."""
    sr = 16000
    d = str(tmp_path / "clips")
    _write_clips(d, sr, [sr // 4, int(sr * 0.375), sr // 2], [220, 330, 440])

    outs = main([
        "--model_id", "test/tiny-audioldm", "--init_aud", d,
        "--target_prompt", "a trumpet", "--source_prompt", "a sine tone",
        "--num_diffusion_steps", "4", "--tstart", "3",
        "--results_path", str(tmp_path / "r"), "--seed", "0",
    ])
    assert len(outs) == 3
    lens = []
    for o in outs:
        assert os.path.exists(o)
        assert "src_a_sine_tone" in o and "dec_a_trumpet" in o
        assert os.path.exists(os.path.join(os.path.dirname(o), "orig.wav"))
        _, data = wavfile.read(o)
        lens.append(len(data))
    # per-clip crops: outputs scale with the input lengths
    assert lens[0] < lens[1] < lens[2]


def test_batch_edit_file_list_stable_audio(tmp_path):
    """Explicit file list on the Stable Audio family."""
    sr = 4000
    d = str(tmp_path / "clips")
    paths = _write_clips(d, sr, [48, 64], [220, 330])

    outs = main([
        "--model_id", "test/tiny-stable-audio", "--init_aud", *paths,
        "--target_prompt", "a violin",
        "--num_diffusion_steps", "4", "--tstart", "3",
        "--results_path", str(tmp_path / "r"), "--seed", "0",
    ])
    assert len(outs) == 2
    for o, n in zip(outs, [48, 64]):
        assert os.path.exists(o)
        _, data = wavfile.read(o)
        assert data.shape[0] == n


@pytest.mark.skipif(jax.device_count() < 2, reason="needs 2 virtual devices")
@pytest.mark.slow
def test_batch_edit_dp_sharded(tmp_path):
    """Clip axis sharded over a 2-way dp mesh."""
    sr = 16000
    d = str(tmp_path / "clips")
    _write_clips(d, sr, [sr // 2, sr // 2], [220, 330])

    outs = main([
        "--model_id", "test/tiny-audioldm", "--init_aud", d,
        "--target_prompt", "a trumpet",
        "--num_diffusion_steps", "4", "--tstart", "3", "--dp", "2",
        "--results_path", str(tmp_path / "r"), "--seed", "1",
    ])
    assert len(outs) == 2 and all(os.path.exists(o) for o in outs)


def test_batch_edit_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        main([
            "--model_id", "test/tiny-audioldm",
            "--init_aud", str(tmp_path / "nope.wav"),
            "--target_prompt", "x",
        ])


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_batch_edit_dp_sp_stable_audio(tmp_path):
    """Clip axis over 'dp' AND each clip's DiT sequence axis over 'sp'."""
    sr = 4000
    d = str(tmp_path / "clips")
    paths = _write_clips(d, sr, [64, 64], [220, 330])

    outs = main([
        "--model_id", "test/tiny-stable-audio", "--init_aud", *paths,
        "--target_prompt", "a violin",
        "--num_diffusion_steps", "4", "--tstart", "3",
        "--dp", "2", "--tp", "2", "--sp", "2",
        "--results_path", str(tmp_path / "r"), "--seed", "0",
    ])
    assert len(outs) == 2 and all(os.path.exists(o) for o in outs)


def test_batch_edit_mixed_channels_rejected(tmp_path):
    """Mono + stereo clips in one Stable Audio batch is a clear error."""
    from audioeditingcode_tpu.utils.audio_io import write_wav

    sr = 4000
    d = str(tmp_path / "clips")
    os.makedirs(d)
    t = np.arange(64, dtype=np.float32) / sr
    write_wav(os.path.join(d, "mono.wav"), (0.4 * np.sin(2 * np.pi * 220 * t))[None], sr)
    write_wav(os.path.join(d, "stereo.wav"),
              np.stack([0.4 * np.sin(2 * np.pi * 330 * t)] * 2), sr)

    with pytest.raises(ValueError, match="channel count"):
        main([
            "--model_id", "test/tiny-stable-audio", "--init_aud", d,
            "--target_prompt", "a violin",
            "--num_diffusion_steps", "4", "--tstart", "3",
            "--results_path", str(tmp_path / "r"), "--seed", "0",
        ])


@pytest.mark.slow
def test_batch_results_feed_the_eval_tower(tmp_path):
    """A run_batch results tree scores through calc_scores unchanged: the
    dir layout and filename regex match main_run.py's, so every clip's
    record parses with its config (the module-docstring claim, proven)."""
    from audioeditingcode_tpu.evals import MelStageExtractor, calc_scores

    sr = 16000
    d = str(tmp_path / "clips")
    _write_clips(d, sr, [sr // 2, sr // 2], [220, 330])

    main([
        "--model_id", "test/tiny-audioldm", "--init_aud", d,
        "--target_prompt", "a trumpet", "--source_prompt", "a piano",
        "--num_diffusion_steps", "4", "--tstart", "3",
        "--results_path", str(tmp_path / "r"), "--seed", "0",
    ])

    model_root = os.path.join(str(tmp_path / "r"), "tiny-audioldm")
    state = calc_scores(MelStageExtractor(), ours_dirs=[model_root],
                        prev_pt=str(tmp_path / "scores.json"), verbose=False)
    assert len(state.records) == 2
    for rec in state.records.values():
        assert rec.target_prompt == "a trumpet"
        assert rec.skip == 1 and rec.tarcfg == 12.0
        assert rec.clap is not None and rec.lpaps is not None
