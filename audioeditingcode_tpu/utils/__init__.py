from .audio_io import (
    read_wav,
    write_wav,
    resample,
    normalize_wav,
    get_duration,
    read_wav_file,
    wav_to_fbank,
    load_audio,
    pad_spec,
)

__all__ = [
    "read_wav",
    "write_wav",
    "resample",
    "normalize_wav",
    "get_duration",
    "read_wav_file",
    "wav_to_fbank",
    "load_audio",
    "pad_spec",
]
