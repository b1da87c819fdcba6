"""STFT / mel-spectrogram frontend as MXU-friendly framed matmuls.

TPU-native re-design of the reference's conv1d-DFT-basis STFT
(reference: code/audioldm/audio/stft.py:15-180). The reference implements the
STFT as a Conv1d whose weights are a windowed DFT basis; on TPU the same
computation maps best onto the MXU as two large matmuls
(frames @ cos_basisᵀ, frames @ sin_basisᵀ) after a strided frame gather —
XLA fuses the gather, the matmuls and the magnitude into one kernel.

Numerical parity targets:
  - window: periodic Hann (scipy get_window('hann', fftbins=True))
  - padding: reflect by n_fft//2 both sides (librosa `center=True` semantics,
    reference stft.py:58-65)
  - mel filterbank: librosa slaney-scale / slaney-norm
    (reference stft.py:145-149 via librosa.filters.mel defaults)
  - compression: log(clamp(x, 1e-5)) (reference audio_processing.py:85-91)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window == scipy.signal.get_window('hann', N, fftbins=True)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float64)


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f_sp * m)


def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_mels, n_fft//2+1).

    Equivalent to librosa.filters.mel(sr=sr, n_fft=n_fft, n_mels=n_mels,
    fmin=fmin, fmax=fmax) with default htk=False, norm='slaney'
    (the reference's TacotronSTFT mel_basis — stft.py:145-149).
    """
    fftfreqs = np.linspace(0.0, sr / 2.0, n_fft // 2 + 1)
    mel_min, mel_max = _hz_to_mel_slaney(np.array([fmin, fmax]))
    mels = np.linspace(mel_min, mel_max, n_mels + 2)
    mel_f = _mel_to_hz_slaney(mels)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # slaney norm: scale to be approx constant energy per channel
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights = weights * enorm[:, None]
    return weights.astype(np.float64)


def dynamic_range_compression(x, clip_val: float = 1e-5, C: float = 1.0):
    """log-clamp compression (reference: audio_processing.py:85-91)."""
    return jnp.log(jnp.clip(x, clip_val, None) * C)


def dynamic_range_decompression(x, C: float = 1.0):
    return jnp.exp(x) / C


@dataclasses.dataclass(frozen=True)
class MelConfig:
    """STFT/mel parameters (reference defaults: models.py:485-493)."""

    filter_length: int = 1024
    hop_length: int = 160
    win_length: int = 1024
    n_mel_channels: int = 64
    sampling_rate: int = 16000
    mel_fmin: float = 0.0
    mel_fmax: float = 8000.0

    def bases(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(cos_basis, sin_basis, mel_basis) as float32 numpy arrays.

        cos/sin bases are the windowed real/imag DFT rows, matching the
        reference's forward_basis = window * fft(eye) (stft.py:26-47):
        fft row k of eye(N) is exp(-2πi k n / N) → real=cos, imag=-sin.
        """
        n_fft = self.filter_length
        cutoff = n_fft // 2 + 1
        n = np.arange(n_fft, dtype=np.float64)
        k = np.arange(cutoff, dtype=np.float64)[:, None]
        ang = 2.0 * np.pi * k * n[None, :] / n_fft
        window = hann_window(self.win_length)
        if self.win_length < n_fft:  # center-pad window to n_fft
            pad = (n_fft - self.win_length) // 2
            window = np.pad(window, (pad, n_fft - self.win_length - pad))
        cos_b = (np.cos(ang) * window[None, :]).astype(np.float32)
        sin_b = (-np.sin(ang) * window[None, :]).astype(np.float32)
        mel_b = mel_filterbank(
            self.sampling_rate, n_fft, self.n_mel_channels, self.mel_fmin, self.mel_fmax
        ).astype(np.float32)
        return cos_b, sin_b, mel_b


def _frame(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """(B, L) -> (B, T, frame_length) overlapping frames via a gather."""
    num_frames = (x.shape[-1] - frame_length) // hop + 1
    idx = np.arange(num_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    return x[..., idx]


@partial(jax.jit, static_argnames=("filter_length", "hop_length", "win_length"))
def _stft_mag_impl(wave, cos_b, sin_b, filter_length, hop_length, win_length):
    pad = filter_length // 2
    x = jnp.pad(wave, [(0, 0), (pad, pad)], mode="reflect")
    frames = _frame(x, filter_length, hop_length)  # (B, T, n_fft)
    real = jnp.einsum("btn,cn->bct", frames, cos_b, preferred_element_type=jnp.float32)
    imag = jnp.einsum("btn,cn->bct", frames, sin_b, preferred_element_type=jnp.float32)
    return jnp.sqrt(real ** 2 + imag ** 2)


def stft_magnitude(wave: jnp.ndarray, config: MelConfig) -> jnp.ndarray:
    """|STFT| of a batch of waveforms (B, L) -> (B, n_fft//2+1, T).

    Matches the reference STFT.transform magnitude (stft.py:52-81):
    reflect pad by n_fft//2, hop-strided frames, windowed DFT.
    """
    cos_b, sin_b, _ = config.bases()
    return _stft_mag_impl(
        wave,
        jnp.asarray(cos_b),
        jnp.asarray(sin_b),
        config.filter_length,
        config.hop_length,
        config.win_length,
    )


@partial(jax.jit, static_argnames=("filter_length", "hop_length", "win_length"))
def _mel_impl(wave, cos_b, sin_b, mel_b, filter_length, hop_length, win_length):
    mag = _stft_mag_impl(wave, cos_b, sin_b, filter_length, hop_length, win_length)
    mel = jnp.einsum("mc,bct->bmt", mel_b, mag, preferred_element_type=jnp.float32)
    log_mel = dynamic_range_compression(mel)
    log_mag = dynamic_range_compression(mag)
    energy = jnp.linalg.norm(mag, axis=1)
    return log_mel, log_mag, energy


def mel_spectrogram(
    wave: jnp.ndarray, config: MelConfig
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """TacotronSTFT.mel_spectrogram equivalent (reference: stft.py:159-180).

    wave: (B, L) in [-1, 1].
    Returns (log_mel (B, n_mels, T), log_magnitudes (B, n_freq, T), energy (B, T)).
    """
    cos_b, sin_b, mel_b = config.bases()
    return _mel_impl(
        wave,
        jnp.asarray(cos_b),
        jnp.asarray(sin_b),
        jnp.asarray(mel_b),
        config.filter_length,
        config.hop_length,
        config.win_length,
    )


def stft_transform(
    wave: jnp.ndarray, config: MelConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(magnitude, phase) like the reference STFT.transform (stft.py:52-81)."""
    cos_b, sin_b, _ = config.bases()
    pad = config.filter_length // 2
    x = jnp.pad(wave, [(0, 0), (pad, pad)], mode="reflect")
    frames = _frame(x, config.filter_length, config.hop_length)
    real = jnp.einsum("btn,cn->bct", frames, jnp.asarray(cos_b),
                      preferred_element_type=jnp.float32)
    imag = jnp.einsum("btn,cn->bct", frames, jnp.asarray(sin_b),
                      preferred_element_type=jnp.float32)
    return jnp.sqrt(real ** 2 + imag ** 2), jnp.arctan2(imag, real)


def inverse_stft(
    magnitude: jnp.ndarray,  # (B, n_fft//2+1, T)
    phase: jnp.ndarray,
    config: MelConfig,
) -> jnp.ndarray:
    """ISTFT via weighted overlap-add with window sum-square compensation
    (reference: stft.py:83-127 STFT.inverse + audio_processing.py:7-63
    window_sumsquare). Returns (B, L) with the reflect padding trimmed."""
    n_fft = config.filter_length
    hop = config.hop_length
    window = hann_window(config.win_length)
    if config.win_length < n_fft:
        p = (n_fft - config.win_length) // 2
        window = np.pad(window, (p, n_fft - config.win_length - p))
    window = jnp.asarray(window, jnp.float32)

    X = magnitude * jnp.exp(1j * phase)  # (B, C, T), basis convention = rfft
    frames = jnp.fft.irfft(jnp.transpose(X, (0, 2, 1)), n=n_fft, axis=-1)
    frames = frames * window[None, None, :]

    B, T = frames.shape[0], frames.shape[1]
    out_len = (T - 1) * hop + n_fft
    idx = np.arange(T)[:, None] * hop + np.arange(n_fft)[None, :]
    sig = jnp.zeros((B, out_len), frames.dtype).at[:, idx].add(frames)
    wss = jnp.zeros((out_len,), frames.dtype).at[idx.reshape(-1)].add(
        jnp.tile(window ** 2, (T,))
    )
    sig = sig / jnp.maximum(wss, 1e-8)[None, :]
    return sig[:, n_fft // 2: -(n_fft // 2)]


def griffin_lim(
    magnitudes: jnp.ndarray,  # (B, n_fft//2+1, T)
    config: MelConfig,
    n_iters: int = 30,
    rng=None,
) -> jnp.ndarray:
    """Phase recovery by alternating projection
    (reference: audio_processing.py:66-82). Vocoder-free waveform synthesis
    from magnitude spectrograms."""
    import jax

    if rng is None:
        rng = jax.random.PRNGKey(0)
    phase = jax.random.uniform(rng, magnitudes.shape, minval=-np.pi, maxval=np.pi)
    signal = inverse_stft(magnitudes, phase, config)

    def body(signal, _):
        _, ang = stft_transform(signal, config)
        ang = ang[..., : magnitudes.shape[-1]]
        return inverse_stft(magnitudes, ang, config), None

    signal, _ = jax.lax.scan(body, signal, None, length=n_iters)
    return signal
