"""Jittable spectral front end: STFT, log-mel filterbank (fbank).

The reference feeds raw 16 kHz waveforms into emotion2vec's conv extractor,
so fbank is not on its critical path — but the north-star design
(BASELINE.json) calls for a fused audio front end, and a mel front end makes
the framework usable with spectrogram-based SER encoders too. Everything is
static-shape XLA: framing via strided gather, rFFT, mel projection as one
matmul on the MXU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    num_mels: int = 80,
    n_fft: int = 400,
    sample_rate: int = 16000,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> np.ndarray:
    """(n_fft//2+1, num_mels) triangular mel filter matrix with continuous
    frequency triangles (no degenerate filters at low num_mels/n_fft ratios)."""
    fmax = fmax or sample_rate / 2
    n_bins = n_fft // 2 + 1
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), num_mels + 2)
    hz_pts = mel_to_hz(mel_pts)  # (num_mels + 2,)
    fft_freqs = np.linspace(0, sample_rate / 2, n_bins)  # (n_bins,)

    lower = hz_pts[:-2][None, :]  # (1, num_mels)
    center = hz_pts[1:-1][None, :]
    upper = hz_pts[2:][None, :]
    f = fft_freqs[:, None]  # (n_bins, 1)
    up = (f - lower) / np.maximum(center - lower, 1e-9)
    down = (upper - f) / np.maximum(upper - center, 1e-9)
    return np.maximum(0.0, np.minimum(up, down)).astype(np.float32)


def frame_signal(wav: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """(B, T) -> (B, F, frame_length) by strided gather (static shapes)."""
    B, T = wav.shape
    num_frames = max(1 + (T - frame_length) // hop, 0)
    starts = jnp.arange(num_frames) * hop
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    return wav[:, idx]


@functools.partial(
    jax.jit, static_argnames=("num_mels", "n_fft", "hop", "sample_rate")
)
def log_mel_spectrogram(
    wav: jax.Array,  # (B, T)
    num_mels: int = 80,
    n_fft: int = 400,
    hop: int = 160,
    sample_rate: int = 16000,
) -> jax.Array:
    """(B, T) -> (B, F, num_mels) log-mel features (25 ms window / 10 ms hop
    defaults)."""
    frames = frame_signal(wav, n_fft, hop)
    window = jnp.asarray(np.hanning(n_fft).astype(np.float32))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    power = jnp.abs(spec) ** 2
    fb = jnp.asarray(mel_filterbank(num_mels, n_fft, sample_rate))
    mel = power @ fb
    return jnp.log(jnp.maximum(mel, 1e-10))


def fbank_lengths(wav_lengths: jax.Array, n_fft: int = 400, hop: int = 160) -> jax.Array:
    return jnp.maximum(1 + (wav_lengths - n_fft) // hop, 0)
