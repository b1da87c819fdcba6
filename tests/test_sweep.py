"""Sweep CLI: one inversion amortized over the (tstart, cfg_tar) grid."""

import glob
import os

import numpy as np
import pytest


@pytest.fixture()
def wav_file(tmp_path):
    from scipy.io import wavfile

    t = np.arange(8000, dtype=np.float32) / 16000
    p = str(tmp_path / "clip.wav")
    wavfile.write(p, 16000, (0.4 * np.sin(2 * np.pi * 330 * t) * 32767).astype(np.int16))
    return p


def test_sweep_grid(wav_file, tmp_path):
    from audioeditingcode_tpu.cli.sweep import main

    outs = main([
        "--model_id", "test/tiny-audioldm", "--init_aud", wav_file,
        "--target_prompt", "a trumpet", "--source_prompt", "a sine",
        "--num_diffusion_steps", "6", "--tstarts", "3", "4",
        "--cfg_tars", "6", "12",
        "--results_path", str(tmp_path / "sweep"), "--seed", "0",
    ])
    assert len(outs) == 4  # 2 tstarts x 2 cfgs
    for o in outs:
        assert os.path.exists(o)
    d = os.path.dirname(outs[0])
    assert os.path.exists(os.path.join(d, "orig.wav"))
    # reference-compatible names: skip = S - tstart appears in the filename
    assert glob.glob(os.path.join(d, "*skip_3*.wav"))
    assert glob.glob(os.path.join(d, "*skip_2*.wav"))
    # different cfg_tar must give different audio at the same tstart
    from scipy.io import wavfile

    a = wavfile.read(outs[0])[1]
    b = wavfile.read(outs[1])[1]
    assert not np.array_equal(a, b)


def test_sweep_matches_single_edit(wav_file, tmp_path):
    """A sweep cell reproduces the standalone main_run edit bit-for-bit?
    Not bitwise (independent RNG draws differ), but the machinery must
    produce finite, in-range audio for every cell."""
    from scipy.io import wavfile

    from audioeditingcode_tpu.cli.sweep import main

    outs = main([
        "--model_id", "test/tiny-audioldm", "--init_aud", wav_file,
        "--target_prompt", "a violin",
        "--num_diffusion_steps", "5", "--tstarts", "5",
        "--cfg_tars", "8",
        "--results_path", str(tmp_path / "s2"), "--seed", "1",
    ])
    sr, data = wavfile.read(outs[0])
    assert sr == 16000 and np.isfinite(data).all() and len(data) > 0


def test_sweep_stable_audio(tmp_path):
    """Stable Audio sweep: ONE history-returning inversion feeds every
    (tstart, cfg_tar) cell; each reverse warm-starts the 2nd-order solver
    from extras[tstart-1]."""
    from scipy.io import wavfile

    from audioeditingcode_tpu.cli.sweep import main

    sr = 4000
    t = np.arange(64, dtype=np.float32) / sr
    p = str(tmp_path / "clip.wav")
    wavfile.write(p, sr, (0.4 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16))

    outs = main([
        "--model_id", "test/tiny-stable-audio", "--init_aud", p,
        "--target_prompt", "a violin", "--source_prompt", "a sine",
        "--num_diffusion_steps", "4", "--tstarts", "2", "3",
        "--cfg_tars", "6", "12",
        "--results_path", str(tmp_path / "sweep_sa"), "--seed", "0",
    ])
    assert len(outs) == 4
    for o in outs:
        sr_out, data = wavfile.read(o)
        assert sr_out == sr and np.isfinite(data).all()
    # different cfg_tar at the same tstart must differ
    a = wavfile.read(outs[0])[1]
    b = wavfile.read(outs[1])[1]
    assert not np.array_equal(a, b)
