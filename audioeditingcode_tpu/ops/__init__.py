from .stft import (
    MelConfig,
    hann_window,
    mel_filterbank,
    stft_magnitude,
    stft_transform,
    inverse_stft,
    griffin_lim,
    mel_spectrogram,
    dynamic_range_compression,
    dynamic_range_decompression,
)
from .filters import gaussian_blur_2d
from .flash_attention import fused_attention

__all__ = [
    "stft_transform",
    "inverse_stft",
    "griffin_lim",
    "fused_attention",
    "MelConfig",
    "hann_window",
    "mel_filterbank",
    "stft_magnitude",
    "mel_spectrogram",
    "dynamic_range_compression",
    "dynamic_range_decompression",
    "gaussian_blur_2d",
]
