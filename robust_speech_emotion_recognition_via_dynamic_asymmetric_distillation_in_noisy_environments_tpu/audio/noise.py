"""SNR-matched noise injection — jittable XLA ops plus numpy reference paths.

Semantics match the reference injectors:
- white noise: noise_power = signal_power / 10^(SNR/10), gaussian noise,
  peak-normalize the mix if |x| > 1 (add_noise_to_audio.py:14-43).
- real (NOISEX-92) noise: tile/crop the noise clip to the signal length, scale
  so that its power hits the target, mix, peak-normalize
  (add_real_noise_to_audio.py:97-160).

The batched variants are the TPU-native additions: they run under jit on
(B, T) padded waveform tensors with a validity mask, so noise injection can be
fused into the feature-extraction forward instead of being an offline
file-by-file pass. The offline CLI (audio/cli.py) reproduces the reference's
``root1-{type}-{snr}db`` / ``root2-{snr}db`` directory trees bit-for-purpose.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

NOISE_TYPES = ("babble", "f16", "factory", "hfchannel", "volvo")

# filename -> type mapping used by the NOISEX-92 5types directory
# (add_real_noise_to_audio.py:38-44)
NOISE_FILE_MAPPING = {
    "babble.wav": "babble",
    "f16.wav": "f16",
    "factory1.wav": "factory",
    "hfchannel.wav": "hfchannel",
    "volvo.wav": "volvo",
}


# ---------------------------------------------------------------------------
# numpy reference paths (used by the offline CLI; ground truth for the tests)
# ---------------------------------------------------------------------------

def add_white_noise_np(
    audio: np.ndarray, snr_db: float, rng: np.random.Generator
) -> np.ndarray:
    signal_power = np.mean(audio**2)
    noise_power = signal_power / (10 ** (snr_db / 10))
    noise = rng.normal(0.0, np.sqrt(noise_power), len(audio))
    noisy = audio + noise
    peak = np.max(np.abs(noisy))
    if peak > 1.0:
        noisy = noisy / peak
    return noisy


def tile_noise_np(noise: np.ndarray, target_length: int) -> np.ndarray:
    if noise.ndim > 1:
        noise = np.mean(noise, axis=1)
    if len(noise) < target_length:
        noise = np.tile(noise, int(np.ceil(target_length / len(noise))))
    return noise[:target_length]


def add_real_noise_np(audio: np.ndarray, noise: np.ndarray, snr_db: float) -> np.ndarray:
    signal_power = np.mean(audio**2)
    noise_power = np.mean(noise**2)
    target = signal_power / (10 ** (snr_db / 10))
    if noise_power > 0:
        noise = noise * np.sqrt(target / noise_power)
    noisy = audio + noise
    peak = np.max(np.abs(noisy))
    if peak > 1.0:
        noisy = noisy / peak
    return noisy


# ---------------------------------------------------------------------------
# jittable single-clip ops
# ---------------------------------------------------------------------------

@jax.jit
def add_white_noise(audio: jax.Array, snr_db: jax.Array, key: jax.Array) -> jax.Array:
    signal_power = jnp.mean(audio**2)
    noise_power = signal_power / (10.0 ** (snr_db / 10.0))
    noise = jax.random.normal(key, audio.shape, audio.dtype) * jnp.sqrt(noise_power)
    noisy = audio + noise
    peak = jnp.max(jnp.abs(noisy))
    return jnp.where(peak > 1.0, noisy / peak, noisy)


def tile_noise(noise: jax.Array, target_length: int, offset: jax.Array) -> jax.Array:
    """Static-shape tile+crop: gathers target_length samples starting at
    ``offset`` modulo the noise length (XLA-friendly, no dynamic shapes)."""
    idx = (jnp.arange(target_length) + offset) % noise.shape[0]
    return jnp.take(noise, idx, axis=0)


@jax.jit
def add_real_noise(audio: jax.Array, noise: jax.Array, snr_db: jax.Array) -> jax.Array:
    signal_power = jnp.mean(audio**2)
    noise_power = jnp.mean(noise**2)
    target = signal_power / (10.0 ** (snr_db / 10.0))
    scale = jnp.where(noise_power > 0, jnp.sqrt(target / jnp.maximum(noise_power, 1e-20)), 1.0)
    noisy = audio + noise * scale
    peak = jnp.max(jnp.abs(noisy))
    return jnp.where(peak > 1.0, noisy / peak, noisy)


# ---------------------------------------------------------------------------
# batched, padding-aware ops (the fused TPU path)
# ---------------------------------------------------------------------------

def _masked_power(wavs: jax.Array, valid: jax.Array) -> jax.Array:
    """Per-row mean power over valid samples. wavs (B,T), valid (B,T) bool."""
    denom = jnp.maximum(jnp.sum(valid, axis=-1), 1)
    return jnp.sum((wavs**2) * valid, axis=-1) / denom


@jax.jit
def batch_add_white_noise(
    wavs: jax.Array,  # (B, T) padded waveforms
    valid: jax.Array,  # (B, T) bool, True = real sample
    snr_db: jax.Array,  # scalar or (B,)
    key: jax.Array,
) -> jax.Array:
    valid = valid.astype(wavs.dtype)
    signal_power = _masked_power(wavs, valid)
    noise_power = signal_power / (10.0 ** (jnp.asarray(snr_db) / 10.0))
    noise = jax.random.normal(key, wavs.shape, wavs.dtype)
    noise = noise * jnp.sqrt(noise_power)[:, None] * valid
    noisy = wavs + noise
    peak = jnp.max(jnp.abs(noisy), axis=-1, keepdims=True)
    return jnp.where(peak > 1.0, noisy / peak, noisy)


@partial(jax.jit, static_argnames=("per_sample_type",))
def batch_mix_noise_bank(
    wavs: jax.Array,  # (B, T)
    valid: jax.Array,  # (B, T) bool
    noise_bank: jax.Array,  # (K, Tn) pre-loaded noise clips (tiled >= T ok)
    snr_db: jax.Array,  # scalar or (B,)
    key: jax.Array,
    noise_type: Optional[int] = None,  # fixed index into the bank (root1 mode)
    per_sample_type: bool = False,  # random type per clip (root2 mode)
) -> jax.Array:
    """Mixes real noise from a device-resident bank at the target SNR.

    root1 mode (``noise_type`` given): every clip gets the same noise type.
    root2 mode (``per_sample_type=True``): a random type per clip
    (add_real_noise_to_audio.py noise_mode 'random').
    A random circular offset into the noise clip decorrelates rows.
    """
    B, T = wavs.shape
    k_type, k_off = jax.random.split(key)
    if per_sample_type:
        types = jax.random.randint(k_type, (B,), 0, noise_bank.shape[0])
    else:
        if noise_type is None:
            noise_type = 0
        types = jnp.full((B,), noise_type, dtype=jnp.int32)
    offsets = jax.random.randint(k_off, (B,), 0, noise_bank.shape[1])

    idx = (jnp.arange(T)[None, :] + offsets[:, None]) % noise_bank.shape[1]
    noise = jnp.take_along_axis(noise_bank[types], idx, axis=1)

    valid_f = valid.astype(wavs.dtype)
    noise = noise * valid_f
    signal_power = _masked_power(wavs, valid_f)
    noise_power = _masked_power(noise, valid_f)
    target = signal_power / (10.0 ** (jnp.asarray(snr_db) / 10.0))
    scale = jnp.where(
        noise_power > 0, jnp.sqrt(target / jnp.maximum(noise_power, 1e-20)), 1.0
    )
    noisy = wavs + noise * scale[:, None]
    peak = jnp.max(jnp.abs(noisy), axis=-1, keepdims=True)
    return jnp.where(peak > 1.0, noisy / peak, noisy)


def load_noise_clips(
    noise_root: str, files: Optional[Sequence[str]] = None
) -> list:
    """Raw NOISEX-92 clips in bank order (NOISE_FILE_MAPPING), mono-mixed —
    the single loader behind both the device-resident bank and the offline
    numpy injector's fixed val/test noise."""
    import os

    from .wavio import read_wav

    clips = []
    for fname in files or list(NOISE_FILE_MAPPING.keys()):
        path = os.path.join(noise_root, fname)
        if not os.path.exists(path):
            raise FileNotFoundError(f"missing noise file: {path}")
        c, _sr = read_wav(path)
        if c.ndim == 2:
            c = c.mean(axis=1)
        clips.append(c.astype(np.float32))
    return clips


def load_noise_bank(
    noise_root: str, target_length: int, files: Optional[Sequence[str]] = None
) -> np.ndarray:
    """Loads the 5 NOISEX-92 files into a (5, target_length) array, tiling
    short clips (add_real_noise_to_audio.py:20-122)."""
    return np.stack(
        [
            tile_noise_np(c, target_length)
            for c in load_noise_clips(noise_root, files)
        ]
    ).astype(np.float32)
