"""Static-shape masking machinery for d2v self-supervised pretraining.

Counterpart of reference ``upstream/models/base.py``: ``random_masking``
(MAE-style, base.py:486-519), span masking via fairseq
``compute_mask_indices`` (base.py:386-398), ``make_maskinfo`` /
``apply_mask`` (base.py:412-470) and the gather helpers (base.py:522-535).

TPU-first design: every mask has an EXACT, trace-time-constant number of
masked positions per row, so the masked-token removal path
(``gather_unmasked``) produces static shapes for XLA. The reference gets the
same property from fairseq's ``require_same_masks=True`` (it trims/extends
rows to a common count, base.py:392); here spans are sampled without
replacement and the union is padded up to the target count with uniformly
random extra positions — the ``add_masks``-style equalization, done on
device with one argsort instead of host numpy.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class MaskInfo(NamedTuple):
    """Static-shape analogue of base.py:71 MaskInfo."""

    mask: jax.Array  # (B, T) bool, True = masked
    ids_keep: jax.Array  # (B, len_keep) int32 — original indices of kept tokens
    ids_restore: jax.Array  # (B, T) int32 — inverse permutation


def span_mask_counts(t: int, mask_prob: float, mask_length: int) -> tuple:
    """(num_spans, num_masked) — python ints, so shapes stay static.

    Mirrors fairseq's ``int(mask_prob * T / mask_length + rand())`` span
    count (deterministic rounding instead of stochastic) with the union
    padded up to exactly ``num_spans * mask_length`` positions."""
    n_spans = max(1, int(mask_prob * t / float(mask_length) + 0.5))
    n_masked = min(n_spans * mask_length, t - 1)
    return n_spans, n_masked


def sample_span_mask(
    key: jax.Array,
    batch: int,
    t: int,
    mask_prob: float,
    mask_length: int,
    inverse_mask: bool = False,
    lengths: Optional[jax.Array] = None,
) -> tuple:
    """Span mask with exactly the same masked count per row.

    Returns (mask (B,T) bool, num_masked int). ``inverse_mask`` masks the
    complement of (1-p) spans (base.py:383-402).

    ``lengths`` (B,) restricts span starts and equalization fills to each
    row's valid frames, like fairseq's compute_mask_indices which receives
    the padding mask (base.py:385: sz excludes padded frames) — without it,
    heavily padded rows spend most of the mask budget on padding. The
    masked COUNT stays a trace-time constant (static shapes); rows shorter
    than the budget overflow into padding, which the d2v loss already
    filters (w_frame = mask & ~padding)."""
    p = 1.0 - mask_prob if inverse_mask else mask_prob
    n_spans, n_masked = span_mask_counts(t, p, mask_length)
    key_s, key_f = jax.random.split(key)
    # span starts without replacement over [0, T - L]
    n_starts = t - mask_length + 1
    noise = jax.random.uniform(key_s, (batch, n_starts))
    if lengths is not None:
        start_pos = jnp.arange(n_starts)
        valid_start = start_pos[None, :] < jnp.maximum(
            lengths[:, None] - mask_length + 1, 1
        )
        noise = noise + 2.0 * (~valid_start)  # invalid starts rank last
    starts = jnp.argsort(noise, axis=1)[:, :n_spans]  # (B, S)
    pos = jnp.arange(t)
    inside = (pos[None, None, :] >= starts[:, :, None]) & (
        pos[None, None, :] < starts[:, :, None] + mask_length
    )
    union = inside.any(axis=1)  # (B, T) — may cover < n_masked due to overlap
    # equalize each row up to exactly n_masked: union positions always win the
    # ranking; random unmasked VALID positions fill, padding only overflows
    fill = jax.random.uniform(key_f, (batch, t))
    score = union.astype(jnp.float32) * 2.0 + fill
    if lengths is not None:
        score = score - 8.0 * (pos[None, :] >= lengths[:, None])
    ranks = jnp.argsort(jnp.argsort(-score, axis=1), axis=1)
    mask = ranks < n_masked
    if inverse_mask:
        mask = ~mask
        n_masked = t - n_masked
    return mask, n_masked


def sample_random_mask(
    key: jax.Array, batch: int, t: int, mask_prob: float
) -> tuple:
    """MAE-style per-token masking (base.py:486-519, the mask_length==1
    path): len_keep = int(T * (1 - p)) tokens kept per row."""
    len_keep = int(t * (1.0 - mask_prob))
    noise = jax.random.uniform(key, (batch, t))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    mask_sorted = jnp.arange(t)[None, :] >= len_keep  # first len_keep kept
    mask = jnp.take_along_axis(
        jnp.broadcast_to(mask_sorted, (batch, t)), ids_restore, axis=1
    )
    return mask, t - len_keep


def make_mask_info(mask: jax.Array, num_masked: int) -> MaskInfo:
    """base.py:412-440 with a trace-time-constant keep length.

    ``jnp.argsort`` is stable, so kept tokens stay in original temporal
    order (torch relies on the same property of uint8 argsort)."""
    t = mask.shape[1]
    len_keep = t - num_masked
    ids_shuffle = jnp.argsort(mask.astype(jnp.int32), axis=1, stable=True)
    ids_restore = jnp.argsort(ids_shuffle, axis=1).astype(jnp.int32)
    ids_keep = ids_shuffle[:, :len_keep].astype(jnp.int32)
    return MaskInfo(mask=mask, ids_keep=ids_keep, ids_restore=ids_restore)


def apply_mask(
    x: jax.Array,
    info: MaskInfo,
    encoder_zero_mask: bool = True,
    mask_noise_std: float = 0.01,
    noise_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Zero (or noise-replace) masked positions in-place (base.py:442-455)."""
    m = info.mask[..., None]
    if encoder_zero_mask:
        return x * (1.0 - m.astype(x.dtype))
    noise = mask_noise_std * jax.random.normal(noise_key, x.shape, x.dtype)
    return jnp.where(m, noise, x)


def gather_unmasked(x: jax.Array, info: MaskInfo) -> jax.Array:
    """(B, T, D) -> (B, len_keep, D) (base.py:522-527)."""
    return jnp.take_along_axis(x, info.ids_keep[..., None], axis=1)


def gather_unmasked_mask(m: jax.Array, info: MaskInfo) -> jax.Array:
    """(B, T) bool -> (B, len_keep) (base.py:530-535)."""
    return jnp.take_along_axis(m, info.ids_keep, axis=1)


def restore_with_mask_tokens(
    x_enc: jax.Array,  # (B, len_keep, D) — encoder output over kept tokens
    info: MaskInfo,
    mask_noise_std: float,
    key: jax.Array,
) -> jax.Array:
    """Decoder input: concat kept tokens with N(0, std) mask tokens and
    unshuffle back to the original temporal order (base.py:157-187
    ``decoder_input``). Returns (B, T, D)."""
    b, len_keep, d = x_enc.shape
    t = info.ids_restore.shape[1]
    mask_tokens = mask_noise_std * jax.random.normal(
        key, (b, t - len_keep, d), x_enc.dtype
    )
    x_full = jnp.concatenate([x_enc, mask_tokens], axis=1)
    return jnp.take_along_axis(x_full, info.ids_restore[..., None], axis=1)
