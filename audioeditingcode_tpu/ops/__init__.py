from .stft import (
    MelConfig,
    hann_window,
    mel_filterbank,
    stft_magnitude,
    mel_spectrogram,
    dynamic_range_compression,
    dynamic_range_decompression,
)
from .filters import gaussian_blur_2d

__all__ = [
    "MelConfig",
    "hann_window",
    "mel_filterbank",
    "stft_magnitude",
    "mel_spectrogram",
    "dynamic_range_compression",
    "dynamic_range_decompression",
    "gaussian_blur_2d",
]
