from .noise import (
    NOISE_TYPES,
    add_real_noise,
    add_white_noise,
    batch_add_white_noise,
    batch_mix_noise_bank,
    tile_noise,
)
from .verify import estimate_snr, verify_noise_injection
from .wavio import read_wav, write_wav
from .format import check_audio_format, fix_audio_format

__all__ = [
    "NOISE_TYPES",
    "add_white_noise",
    "add_real_noise",
    "batch_add_white_noise",
    "batch_mix_noise_bank",
    "tile_noise",
    "estimate_snr",
    "verify_noise_injection",
    "read_wav",
    "write_wav",
    "check_audio_format",
    "fix_audio_format",
]
