"""Masked reductions used throughout the compute path.

These replace the reference's boolean-indexing idioms (which would create
data-dependent shapes under jit) with weight-masked computations of identical
numerical semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_mean_pool(x: jax.Array, padding_mask: jax.Array) -> jax.Array:
    """Mean over time of valid frames.

    x: (B, T, D); padding_mask: (B, T) bool with True = pad
    (reference DAD model.py:30-39 / pretrain model.py:16-18).
    """
    keep = (~padding_mask).astype(x.dtype)[..., None]
    total = jnp.sum(x * keep, axis=1)
    count = jnp.clip(jnp.sum(keep, axis=1), 1.0, None)
    return total / count


def masked_quantile(
    scores: jax.Array,  # (B,)
    member: jax.Array,  # (B,) bool — which samples participate
    q: jax.Array,  # scalar in [0, 1]
    fallback: jax.Array,  # scalar used when no member exists
) -> jax.Array:
    """Linear-interpolation quantile over the masked subset.

    Matches torch.quantile's default 'linear' interpolation on the subset
    ``scores[member]`` (reference utils.py:481), with ``fallback`` returned
    when the subset is empty (utils.py:483-484).
    """
    big = jnp.asarray(jnp.inf, scores.dtype)
    filled = jnp.where(member, scores, big)
    s = jnp.sort(filled)  # members ascending, +inf tail
    n = jnp.sum(member)
    pos = q * jnp.maximum(n - 1, 0).astype(scores.dtype)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo.astype(scores.dtype)
    lo_v = s[jnp.clip(lo, 0, scores.shape[0] - 1)]
    hi_v = s[jnp.clip(hi, 0, scores.shape[0] - 1)]
    val = lo_v + frac * (hi_v - lo_v)
    return jnp.where(n > 0, val, fallback)


def masked_softmax_stats(probs: jax.Array, row_valid: jax.Array):
    """(max_prob, argmax) per row with invalid rows forced to class 0 / 0.0."""
    max_p = jnp.max(probs, axis=-1) * row_valid
    preds = jnp.argmax(probs, axis=-1) * row_valid.astype(jnp.int32)
    return max_p, preds
