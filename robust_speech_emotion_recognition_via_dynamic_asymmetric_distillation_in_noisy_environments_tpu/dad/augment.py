"""Feature-space weak/strong augmentation with explicit PRNG keys.

Reference semantics (utils.py:317-375):
- weak: x + N(0, weak_std^2)
- strong: x + N(0, strong_std^2), then one feature-channel dropout mask
  shared across the whole batch and all timesteps (torch.rand(shape[-1])),
  then a contiguous temporal mask of ``int(t * ratio)`` frames per sample
  with a random start — t being the collated batch length. The reference
  collator pads exactly to the batch max, but this framework's buckets
  round the array dim PAST the batch max, so the mask length/start must be
  derived from the batch's valid max (via ``padding_mask``), not the
  bucket-padded shape — otherwise bucketing silently strengthens the
  augmentation. Traced scalars keep all shapes static.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..configs import AugmentConfig


def weak_augment(key: jax.Array, x: jax.Array, cfg: AugmentConfig) -> jax.Array:
    return x + jax.random.normal(key, x.shape, x.dtype) * cfg.weak_noise_std


def strong_augment(
    key: jax.Array,
    x: jax.Array,
    cfg: AugmentConfig,
    padding_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """x: (B, T, D); padding_mask (B, T) bool True=pad (optional — without
    it the padded length T stands in for the batch max)."""
    k_noise, k_feat, k_time = jax.random.split(key, 3)
    B, T, D = x.shape

    out = x + jax.random.normal(k_noise, x.shape, x.dtype) * cfg.strong_noise_std

    if cfg.feature_dropout_rate > 0:
        feat_mask = (
            jax.random.uniform(k_feat, (D,)) > cfg.feature_dropout_rate
        ).astype(x.dtype)
        out = out * feat_mask

    if cfg.temporal_mask_ratio > 0:
        if padding_mask is not None:
            # the reference's t = collated batch max, not the bucket length
            t_valid = jnp.max(jnp.sum(~padding_mask, axis=1))
        else:
            t_valid = jnp.asarray(T)
        mask_len = jnp.floor(
            t_valid.astype(jnp.float32) * cfg.temporal_mask_ratio
        ).astype(jnp.int32)
        start = jax.random.randint(
            k_time, (B,), 0, jnp.maximum(1, t_valid - mask_len + 1)
        )
        idx = jnp.arange(T)[None, :]
        tmask = (
            (idx >= start[:, None])
            & (idx < start[:, None] + mask_len)
            & (mask_len > 0)
        )
        out = jnp.where(tmask[:, :, None], 0.0, out)
    return out
