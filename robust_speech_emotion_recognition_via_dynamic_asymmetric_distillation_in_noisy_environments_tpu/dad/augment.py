"""Feature-space weak/strong augmentation with explicit PRNG keys.

Reference semantics (utils.py:317-375):
- weak: x + N(0, weak_std^2)
- strong: x + N(0, strong_std^2), then one feature-channel dropout mask
  shared across the whole batch and all timesteps (torch.rand(shape[-1])),
  then a contiguous temporal mask of ``int(T * ratio)`` frames per sample
  with a random start — T being the PADDED batch length, exactly like the
  reference computes it from the collated tensor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..configs import AugmentConfig


def weak_augment(key: jax.Array, x: jax.Array, cfg: AugmentConfig) -> jax.Array:
    return x + jax.random.normal(key, x.shape, x.dtype) * cfg.weak_noise_std


def strong_augment(key: jax.Array, x: jax.Array, cfg: AugmentConfig) -> jax.Array:
    """x: (B, T, D)."""
    k_noise, k_feat, k_time = jax.random.split(key, 3)
    B, T, D = x.shape

    out = x + jax.random.normal(k_noise, x.shape, x.dtype) * cfg.strong_noise_std

    if cfg.feature_dropout_rate > 0:
        feat_mask = (
            jax.random.uniform(k_feat, (D,)) > cfg.feature_dropout_rate
        ).astype(x.dtype)
        out = out * feat_mask

    mask_len = int(T * cfg.temporal_mask_ratio)
    if cfg.temporal_mask_ratio > 0 and mask_len > 0:
        start = jax.random.randint(k_time, (B,), 0, max(1, T - mask_len + 1))
        idx = jnp.arange(T)[None, :]
        tmask = (idx >= start[:, None]) & (idx < start[:, None] + mask_len)
        out = jnp.where(tmask[:, :, None], 0.0, out)
    return out
