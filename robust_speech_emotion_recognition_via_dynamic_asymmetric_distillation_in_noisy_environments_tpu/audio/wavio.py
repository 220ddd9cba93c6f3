"""Minimal wav IO on the stdlib ``wave`` module (no soundfile dependency).

Handles 16-bit and 32-bit integer PCM plus 32-bit float, mono or multi-channel,
returning float64 in [-1, 1] like soundfile does for the reference scripts.
"""

from __future__ import annotations

import struct
import wave
from typing import Tuple

import numpy as np

_PCM_DTYPES = {1: np.int8, 2: np.int16, 4: np.int32}


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Returns (audio float64 in [-1,1], sample_rate). Multi-channel audio
    comes back as (frames, channels)."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n_channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if sampwidth == 4 and _looks_float(path):
        data = np.frombuffer(frames, dtype=np.float32).astype(np.float64)
    elif sampwidth == 1:
        # WAV stores 8-bit PCM UNSIGNED with a 128 offset (silence = 0x80)
        data = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0)
        data /= 128.0
    else:
        dtype = _PCM_DTYPES[sampwidth]
        data = np.frombuffer(frames, dtype=dtype).astype(np.float64)
        data /= float(2 ** (8 * sampwidth - 1))
    if n_channels > 1:
        data = data.reshape(-1, n_channels)
    return data, sr


def _looks_float(path: str) -> bool:
    """Peeks at the fmt chunk's audio-format tag (3 == IEEE float)."""
    try:
        with open(path, "rb") as f:
            header = f.read(64)
        i = header.find(b"fmt ")
        if i < 0:
            return False
        (tag,) = struct.unpack_from("<H", header, i + 8)
        return tag == 3
    except OSError:
        return False


def write_wav(path: str, audio: np.ndarray, sr: int) -> None:
    """Writes 16-bit PCM (the format the corpora use)."""
    audio = np.asarray(audio)
    if audio.ndim == 2:
        n_channels = audio.shape[1]
        flat = audio.reshape(-1)
    else:
        n_channels = 1
        flat = audio
    clipped = np.clip(flat, -1.0, 1.0)
    pcm = (clipped * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
