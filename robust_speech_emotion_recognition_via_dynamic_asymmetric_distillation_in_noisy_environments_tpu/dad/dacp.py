"""DACP — Dynamic Adaptive Confidence Pruning, as pure functional state.

Re-implements DACPManager (reference utils.py:379-507) with the per-batch
threshold EMA and per-epoch quality EMA threaded through a NamedTuple so the
whole thing lives inside the jitted train step:

stage 1  certainty s = p_max * (1 - H(p)/log2 C)            (utils.py:400-428)
stage 2  per-epoch per-class quality EMA (beta)             (utils.py:430-447)
stage 3  class weights W_c = sigmoid(k * (Q_c - mean Q)),
         quantile level gamma_e ramps q_start -> q_end      (utils.py:465-473)
stage 4  per-class batch quantile threshold (EMA fallback when the class is
         absent), +lambda*(W_c-0.5), floored at calibrated anchors, then
         EMA-smoothed with alpha — updated EVERY train batch (utils.py:475-501)

The reference buffers raw python lists of scores per class during the epoch
(utils.py:503-505); here that becomes running (sum, count) pairs with
identical epoch-mean semantics.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..configs import DACPConfig
from ..ops.masked import masked_quantile


class DACPState(NamedTuple):
    quality: jax.Array  # (C,) Q_c, init 0.5
    ema_thresholds: jax.Array  # (C,) tau_c, init 0.5
    score_sums: jax.Array  # (C,) running per-epoch score sums
    score_counts: jax.Array  # (C,) running per-epoch score counts


def init_dacp(num_classes: int) -> DACPState:
    return DACPState(
        quality=jnp.full((num_classes,), 0.5, jnp.float32),
        ema_thresholds=jnp.full((num_classes,), 0.5, jnp.float32),
        score_sums=jnp.zeros((num_classes,), jnp.float32),
        score_counts=jnp.zeros((num_classes,), jnp.float32),
    )


def certainty_scores(
    probs: jax.Array, use_entropy: bool = True
) -> Tuple[jax.Array, jax.Array]:
    """Stage 1 (utils.py:400-428). probs: (B, C) -> (scores, preds)."""
    max_probs = jnp.max(probs, axis=-1)
    preds = jnp.argmax(probs, axis=-1)
    if use_entropy:
        entropy = -jnp.sum(probs * jnp.log2(probs + 1e-8), axis=-1)
        normalized = entropy / jnp.log2(jnp.asarray(probs.shape[-1], probs.dtype))
        scores = max_probs * (1.0 - normalized)
    else:
        scores = max_probs
    return scores, preds


def dacp_mask(
    state: DACPState,
    teacher_probs: jax.Array,  # (B, C)
    row_valid: jax.Array,  # (B,) bool
    gamma_e: jax.Array,  # scalar quantile level for this epoch
    anchors: jax.Array,  # (C,) calibrated anchor floors
    cfg: DACPConfig,
) -> Tuple[DACPState, jax.Array, jax.Array, jax.Array]:
    """One training-batch DACP update. Returns
    (new_state, mask (B,) bool, scores (B,), class_weights (C,))."""
    C = teacher_probs.shape[-1]
    scores, preds = certainty_scores(teacher_probs, cfg.use_entropy_in_score)

    # stage 3: class weights from relative quality gaps
    avg_q = jnp.mean(state.quality)
    wce = jax.nn.sigmoid(cfg.sensitivity_k * (state.quality - avg_q))

    # per-class batch threshold: quantile of this batch's scores for samples
    # predicted c; EMA threshold as fallback when the class is absent
    onehot = jax.nn.one_hot(preds, C, dtype=scores.dtype) * row_valid[:, None]

    def class_threshold(c):
        member = (preds == c) & row_valid
        return masked_quantile(scores, member, gamma_e, state.ema_thresholds[c])

    batch_thr = jax.vmap(class_threshold)(jnp.arange(C))

    # stage 4: dynamic adjustment + anchor floor + threshold EMA
    dynamic = batch_thr + cfg.calibration_strength_lambda * (wce - 0.5)
    floored = jnp.maximum(dynamic, anchors)
    new_thr = (
        cfg.threshold_smoothing_alpha * state.ema_thresholds
        + (1.0 - cfg.threshold_smoothing_alpha) * floored
    )

    mask = (scores >= new_thr[preds]) & row_valid

    # buffer scores for the epoch-end quality update (all valid rows,
    # grouped by predicted class — utils.py:503-505)
    sums = state.score_sums + onehot.T @ scores
    counts = state.score_counts + jnp.sum(onehot, axis=0)

    return (
        DACPState(state.quality, new_thr, sums, counts),
        mask,
        scores,
        wce,
    )


def fixed_threshold_mask(
    teacher_probs: jax.Array, row_valid: jax.Array, threshold: float
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """USE_DACP=False path (train.py:417-420): plain max-prob confidence with
    a fixed threshold. Returns (mask, scores, class_weights=ones(C)).

    Contract (same as dacp_mask): ``scores`` are RAW per-row scores; validity
    is carried by ``mask`` and applied at use sites (ECDA multiplies by the
    selection mask, tracking filters by id), never baked into the scores."""
    scores = jnp.max(teacher_probs, axis=-1)
    mask = (scores >= threshold) & row_valid
    wce = jnp.ones((teacher_probs.shape[-1],), teacher_probs.dtype)
    return mask, scores, wce


def dacp_epoch_update(state: DACPState, cfg: DACPConfig) -> DACPState:
    """Stage 2, run at epoch end (utils.py:430-447): EMA the per-class epoch
    mean score into Q_c; classes with no samples keep their old quality."""
    mean = jnp.where(
        state.score_counts > 0,
        state.score_sums / jnp.maximum(state.score_counts, 1.0),
        state.quality,
    )
    quality = (
        cfg.quality_smoothing_beta * state.quality
        + (1.0 - cfg.quality_smoothing_beta) * mean
    )
    return DACPState(
        quality=quality,
        ema_thresholds=state.ema_thresholds,
        score_sums=jnp.zeros_like(state.score_sums),
        score_counts=jnp.zeros_like(state.score_counts),
    )
