"""Long-form chunked editing: window math, crossfade, end-to-end CLI."""

import os

import numpy as np
import pytest

from audioeditingcode_tpu.editing.longform import (
    overlap_add,
    split_windows,
    window_starts,
)


class TestWindows:
    def test_short_clip_single_window(self):
        assert window_starts(50, 100, 80) == [0]

    def test_full_coverage_with_tail_pullback(self):
        starts = window_starts(250, 100, 80)
        assert starts[0] == 0
        assert starts[-1] + 100 == 250
        covered = set()
        for s in starts:
            covered.update(range(s, s + 100))
        assert covered == set(range(250))

    def test_split_pads_short_input(self):
        mel = np.random.randn(1, 1, 30, 8).astype(np.float32)
        wins, starts = split_windows(mel, 48, 40)
        assert wins.shape == (1, 1, 48, 8)
        np.testing.assert_array_equal(wins[0, :, :30], mel[0])
        assert (wins[0, :, 30:] == 0).all()

    def test_split_shapes(self):
        mel = np.random.randn(1, 1, 100, 8).astype(np.float32)
        wins, starts = split_windows(mel, 48, 40)
        assert wins.shape[0] == len(starts)
        for i, s in enumerate(starts):
            np.testing.assert_array_equal(wins[i], mel[0, :, s: s + 48])


class TestOverlapAdd:
    def test_identity_windows_reconstruct(self):
        """Splitting a signal into overlapping windows and stitching them
        back must reproduce it exactly (crossfade weights sum to 1)."""
        sig = np.random.randn(1, 1000).astype(np.float32)
        Tw, hop = 300, 250
        starts = window_starts(1000, Tw, hop)
        wavs = np.stack([sig[:, s: s + Tw] for s in starts])
        out = overlap_add(wavs, starts, 1000)
        np.testing.assert_allclose(out, sig, atol=1e-5)

    def test_single_window(self):
        sig = np.random.randn(2, 100).astype(np.float32)
        out = overlap_add(sig[None], [0], 100)
        np.testing.assert_allclose(out, sig, atol=1e-6)


@pytest.mark.slow
def test_run_long_cli(tmp_path):
    """3-window end-to-end edit of a 1.5 s clip with 0.7 s chunks."""
    from scipy.io import wavfile

    from audioeditingcode_tpu.cli.run_long import main

    sr = 16000
    t = np.arange(int(sr * 1.0), dtype=np.float32) / sr
    p = str(tmp_path / "clip.wav")
    wavfile.write(p, sr, (0.4 * np.sin(2 * np.pi * 330 * t) * 32767).astype(np.int16))

    out = main([
        "--model_id", "test/tiny-audioldm", "--init_aud", p,
        "--target_prompt", "a trumpet", "--source_prompt", "a sine tone",
        "--num_diffusion_steps", "4", "--tstart", "3",
        "--chunk_seconds", "0.5", "--overlap_seconds", "0.2",
        "--results_path", str(tmp_path / "r"), "--seed", "0",
    ])
    assert os.path.exists(out)
    sr_out, data = wavfile.read(out)
    assert sr_out == sr and len(data) > int(sr * 0.8)  # stitched ~full length


def test_run_long_cli_stable_audio(tmp_path):
    """Waveform-domain chunked edit on the Stable Audio family (tiny model:
    64-sample / 16 ms VAE window @ 4 kHz -> 4 windows over a 50 ms clip)."""
    from scipy.io import wavfile

    from audioeditingcode_tpu.cli.run_long import main

    sr = 4000
    t = np.arange(200, dtype=np.float32) / sr
    p = str(tmp_path / "clip.wav")
    wavfile.write(p, sr, (0.4 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16))

    out = main([
        "--model_id", "test/tiny-stable-audio", "--init_aud", p,
        "--target_prompt", "a violin", "--source_prompt", "a sine tone",
        "--num_diffusion_steps", "4", "--tstart", "3",
        "--chunk_seconds", "0.016", "--overlap_seconds", "0.004",
        "--results_path", str(tmp_path / "rsa"), "--seed", "0",
    ])
    assert os.path.exists(out)
    sr_out, data = wavfile.read(out)
    assert sr_out == sr
    assert data.shape[0] == 200  # stitched back to the input length


@pytest.mark.slow
def test_run_long_cli_dp_sharded(tmp_path):
    """Window axis sharded over a 2-way dp mesh."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs 2 virtual devices")
    from scipy.io import wavfile

    from audioeditingcode_tpu.cli.run_long import main

    sr = 16000
    t = np.arange(int(sr * 1.2), dtype=np.float32) / sr
    p = str(tmp_path / "clip.wav")
    wavfile.write(p, sr, (0.4 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16))

    out = main([
        "--model_id", "test/tiny-audioldm", "--init_aud", p,
        "--target_prompt", "a trumpet",
        "--num_diffusion_steps", "4", "--tstart", "3",
        "--chunk_seconds", "0.6", "--overlap_seconds", "0.15",
        "--dp", "2",
        "--results_path", str(tmp_path / "r2"), "--seed", "1",
    ])
    assert os.path.exists(out)


def test_run_long_cli_sp_stable_audio(tmp_path):
    """Window axis over 'dp' and the DiT sequence axis over 'sp'."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from scipy.io import wavfile

    from audioeditingcode_tpu.cli.run_long import main

    sr = 4000
    t = np.arange(200, dtype=np.float32) / sr
    p = str(tmp_path / "clip.wav")
    wavfile.write(p, sr, (0.4 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16))

    out = main([
        "--model_id", "test/tiny-stable-audio", "--init_aud", p,
        "--target_prompt", "a violin",
        "--num_diffusion_steps", "4", "--tstart", "3",
        "--chunk_seconds", "0.016", "--overlap_seconds", "0.004",
        "--dp", "2", "--tp", "2", "--sp", "2",
        "--results_path", str(tmp_path / "rsp"), "--seed", "0",
    ])
    assert os.path.exists(out)
