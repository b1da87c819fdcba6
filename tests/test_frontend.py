"""Golden tests for the STFT/mel frontend vs torch mirrors of the reference.

The reference computes the STFT as a Conv1d with a windowed DFT basis
(code/audioldm/audio/stft.py:15-81); these tests rebuild that exact
computation in torch (CPU) and check the JAX framed-matmul kernel against it.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from audioeditingcode_tpu.ops.stft import (
    MelConfig,
    hann_window,
    mel_filterbank,
    stft_magnitude,
    mel_spectrogram,
)
from audioeditingcode_tpu.ops.filters import gaussian_blur_2d
from audioeditingcode_tpu.utils.audio_io import (
    normalize_wav,
    pad_spec,
    read_wav,
    write_wav,
    resample,
    get_duration,
)


def torch_reference_stft_mag(wave: np.ndarray, n_fft=1024, hop=160, win=1024):
    """Mirror of the reference STFT.transform (conv1d with windowed DFT basis)."""
    fourier_basis = np.fft.fft(np.eye(n_fft))
    cutoff = n_fft // 2 + 1
    fb = np.vstack([np.real(fourier_basis[:cutoff]), np.imag(fourier_basis[:cutoff])])
    forward_basis = torch.FloatTensor(fb[:, None, :])
    fft_window = torch.hann_window(win, periodic=True)
    if win < n_fft:
        pad = (n_fft - win) // 2
        fft_window = F.pad(fft_window, (pad, n_fft - win - pad))
    forward_basis = forward_basis * fft_window

    x = torch.from_numpy(wave).float()
    x = x.view(x.shape[0], 1, x.shape[1])
    x = F.pad(x.unsqueeze(1), (n_fft // 2, n_fft // 2, 0, 0), mode="reflect").squeeze(1)
    out = F.conv1d(x, forward_basis, stride=hop)
    real, imag = out[:, :cutoff], out[:, cutoff:]
    return torch.sqrt(real ** 2 + imag ** 2).numpy()


def test_hann_window_matches_torch():
    np.testing.assert_allclose(
        hann_window(1024), torch.hann_window(1024, periodic=True).numpy(), atol=1e-6
    )


def test_stft_magnitude_matches_reference_conv1d():
    rng = np.random.default_rng(0)
    wave = np.clip(rng.standard_normal((2, 16000)).astype(np.float32) * 0.2, -1, 1)
    cfg = MelConfig()
    ours = np.asarray(stft_magnitude(jnp.asarray(wave), cfg))
    ref = torch_reference_stft_mag(wave)
    assert ours.shape == ref.shape == (2, 513, 16000 // 160 + 1)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)


def independent_slaney_mel(sr, n_fft, n_mels, fmin, fmax):
    """Second, loop-based implementation of librosa's slaney mel filterbank."""

    def hz2mel(f):
        if f < 1000.0:
            return f * 3.0 / 200.0
        return 15.0 + np.log(f / 1000.0) / (np.log(6.4) / 27.0)

    def mel2hz(m):
        if m < 15.0:
            return m * 200.0 / 3.0
        return 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0))

    pts = [mel2hz(m) for m in np.linspace(hz2mel(fmin), hz2mel(fmax), n_mels + 2)]
    freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    fb = np.zeros((n_mels, len(freqs)))
    for i in range(n_mels):
        lo, ce, hi = pts[i], pts[i + 1], pts[i + 2]
        for j, f in enumerate(freqs):
            if lo <= f <= ce and ce != lo:
                fb[i, j] = (f - lo) / (ce - lo)
            elif ce < f <= hi and hi != ce:
                fb[i, j] = (hi - f) / (hi - ce)
        fb[i] *= 2.0 / (hi - lo)
    return fb


def test_mel_filterbank_matches_independent_impl():
    ours = mel_filterbank(16000, 1024, 64, 0.0, 8000.0)
    ref = independent_slaney_mel(16000, 1024, 64, 0.0, 8000.0)
    assert ours.shape == (64, 513)
    np.testing.assert_allclose(ours, ref, atol=1e-8)


def test_mel_spectrogram_shapes_and_compression():
    rng = np.random.default_rng(1)
    wave = np.clip(rng.standard_normal((1, 32000)).astype(np.float32) * 0.3, -1, 1)
    cfg = MelConfig()
    log_mel, log_mag, energy = mel_spectrogram(jnp.asarray(wave), cfg)
    assert log_mel.shape == (1, 64, 201)
    assert log_mag.shape == (1, 513, 201)
    assert energy.shape == (1, 201)
    # log-clamp floor
    assert float(jnp.min(log_mel)) >= np.log(1e-5) - 1e-5


def test_gaussian_blur_matches_torch_conv():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 32, 16)).astype(np.float32)
    ours = np.asarray(gaussian_blur_2d(jnp.asarray(x), kernel_size=15, sigma=1.0))

    # torch mirror of torchvision's gaussian_blur
    ks, sigma = 15, 1.0
    t = np.linspace(-(ks - 1) / 2, (ks - 1) / 2, ks)
    k1 = np.exp(-0.5 * (t / sigma) ** 2)
    k1 = torch.from_numpy((k1 / k1.sum()).astype(np.float32))
    kernel = (k1[:, None] * k1[None, :]).expand(3, 1, ks, ks)
    xt = torch.from_numpy(x)
    xt = F.pad(xt, (ks // 2,) * 4, mode="reflect")
    ref = F.conv2d(xt, kernel, groups=3).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_wav_roundtrip_and_resample(tmp_path):
    sr = 22050
    t = np.arange(sr, dtype=np.float32) / sr
    wave = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]
    p = str(tmp_path / "a.wav")
    write_wav(p, wave, sr)
    assert abs(get_duration(p) - 1.0) < 1e-3
    back, sr2 = read_wav(p)
    assert sr2 == sr
    np.testing.assert_allclose(back, wave, atol=1e-3)

    r = resample(wave, sr, 16000)
    assert r.shape[-1] == 16000
    # energy of a pure tone below Nyquist is preserved
    assert abs(np.std(r) - np.std(wave)) < 0.02


def test_normalize_and_pad_spec():
    w = np.array([1.0, 3.0, 5.0], dtype=np.float32)
    n = normalize_wav(w)
    assert abs(np.max(np.abs(n)) - 0.5) < 1e-6
    fb = np.ones((10, 64), dtype=np.float32)
    assert pad_spec(fb, 16).shape == (16, 64)
    assert pad_spec(fb, 4).shape == (4, 64)
    odd = np.ones((10, 65), dtype=np.float32)
    assert pad_spec(odd, 10).shape == (10, 64)


class TestInverseSTFT:
    def test_roundtrip_reconstruction(self):
        from audioeditingcode_tpu.ops.stft import (
            MelConfig,
            inverse_stft,
            stft_transform,
        )

        cfg = MelConfig()
        t = np.arange(16000, dtype=np.float32) / 16000
        wave = (0.4 * np.sin(2 * np.pi * 440 * t)
                + 0.2 * np.sin(2 * np.pi * 1234 * t))[None, :]
        mag, phase = stft_transform(jnp.asarray(wave), cfg)
        rec = np.asarray(inverse_stft(mag, phase, cfg))
        n = min(rec.shape[-1], wave.shape[-1])
        # interior must reconstruct near-exactly (edges lack full overlap)
        err = np.abs(rec[0, 1024:n - 1024] - wave[0, 1024:n - 1024]).max()
        assert err < 1e-3, err

    def test_griffin_lim_converges(self):
        from audioeditingcode_tpu.ops.stft import (
            MelConfig,
            griffin_lim,
            stft_transform,
        )

        cfg = MelConfig()
        t = np.arange(8000, dtype=np.float32) / 16000
        wave = (0.5 * np.sin(2 * np.pi * 440 * t))[None, :]
        mag, _ = stft_transform(jnp.asarray(wave), cfg)
        def rel_err(n_iters):
            rec = griffin_lim(mag, cfg, n_iters=n_iters, rng=jax.random.PRNGKey(0))
            mag_rec, _ = stft_transform(rec, cfg)
            n = min(mag.shape[-1], mag_rec.shape[-1])
            return (np.linalg.norm(np.asarray(mag_rec)[..., :n]
                                   - np.asarray(mag)[..., :n])
                    / np.linalg.norm(np.asarray(mag)))

        e0, e20 = rel_err(0), rel_err(20)
        assert e20 < 0.35, e20          # close in magnitude after 20 iters
        assert e20 < 0.6 * e0, (e0, e20)  # and clearly converging
