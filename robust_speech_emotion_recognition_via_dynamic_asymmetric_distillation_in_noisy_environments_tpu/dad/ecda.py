"""ECDA — Energy/Class-aware Distribution Alignment loss.

Re-implements ECDALoss (reference utils.py:510-652) as a fully shape-static
masked computation:

per class c (class-aware branch):
  clean set  = {clean embeddings with label c}           weights 1
  noisy set  = {noisy embeddings with pseudo-label c AND DACP mask}
               weights = certainty scores
  MMD_c      = attention-weighted multi-kernel MMD       (utils.py:612-617)
  compact_c  = mean ||x - centroid_c||^2                 (utils.py:619-621)
  repulsion  = -mean pairwise distance between all class centroids
               (global, added per class)                 (utils.py:584-595)
  ecda_c     = MMD_c + gamma * compact_c + delta * repulsion
  gate       : class contributes only when it has >= 2 clean and >= 2 masked
               noisy samples                             (utils.py:609)
  total      = sum_c a_c * ecda_c with a_c = exp(lambda*(mean(W) - W_c))

The reference's boolean indexing (noisy_feats[(labels==c)&mask]) becomes
zero-weight masking, which is numerically identical because every kernel term
is weight-normalized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..configs import ECDAConfig
from ..ops.mmd import pairwise_sq_dists, weighted_mmd_terms


def ecda_loss(
    clean_emb: jax.Array,  # (Bs, D)
    noisy_emb: jax.Array,  # (Bt, D)
    clean_labels: jax.Array,  # (Bs,) int
    noisy_pseudo: jax.Array,  # (Bt,) int teacher argmax
    noisy_mask: jax.Array,  # (Bt,) bool DACP gate
    noisy_scores: jax.Array,  # (Bt,) certainty scores
    class_weights: jax.Array,  # (C,) W_c from DACP
    clean_valid: jax.Array,  # (Bs,) bool real rows
    noisy_valid: jax.Array,  # (Bt,) bool real rows
    cfg: ECDAConfig,
) -> jax.Array:
    C = class_weights.shape[0]
    Bs = clean_emb.shape[0]
    dtype = clean_emb.dtype

    noisy_mask = noisy_mask & noisy_valid
    both = jnp.concatenate([clean_emb, noisy_emb], axis=0)
    l2 = pairwise_sq_dists(both)

    if not cfg.use_class_aware_mmd:
        # ablation branch: one global unweighted MMD (utils.py:633-651)
        w_s = clean_valid.astype(dtype)
        w_t = noisy_mask.astype(dtype)
        member = jnp.concatenate([clean_valid, noisy_mask])
        ss, tt, st = weighted_mmd_terms(
            l2, jnp.concatenate([w_s, jnp.zeros_like(w_t)]),
            jnp.concatenate([jnp.zeros_like(w_s), w_t]),
            member, cfg.kernel_mul, cfg.kernel_num,
        )
        gate = (jnp.sum(w_s) >= 2) & (jnp.sum(w_t) >= 2)
        return jnp.where(gate, ss + tt - 2.0 * st, 0.0)

    # --- class centroids and global repulsion ---
    m_t = (
        jax.nn.one_hot(noisy_pseudo, C, dtype=dtype) * noisy_mask[:, None].astype(dtype)
    )  # (Bt, C)
    counts_t = jnp.sum(m_t, axis=0)  # (C,)
    centroids = (m_t.T @ noisy_emb) / jnp.maximum(counts_t, 1.0)[:, None]  # (C, D)
    has_centroid = counts_t >= 1

    cd = jnp.sqrt(jnp.maximum(pairwise_sq_dists(centroids), 1e-12))
    pair_valid = (
        has_centroid[:, None]
        & has_centroid[None, :]
        & (jnp.arange(C)[:, None] < jnp.arange(C)[None, :])
    )
    n_pairs = jnp.sum(pair_valid)
    repulsion = jnp.where(
        n_pairs > 0,
        -jnp.sum(cd * pair_valid) / jnp.maximum(n_pairs, 1),
        0.0,
    )

    # --- class-level attention (utils.py:597-599) ---
    avg_w = jnp.mean(class_weights)
    attention = jnp.exp(cfg.class_attention_lambda * (avg_w - class_weights))

    m_s = (
        jax.nn.one_hot(clean_labels, C, dtype=dtype) * clean_valid[:, None].astype(dtype)
    )  # (Bs, C)
    counts_s = jnp.sum(m_s, axis=0)

    zeros_s = jnp.zeros((Bs,), dtype)
    zeros_t = jnp.zeros((noisy_emb.shape[0],), dtype)

    def per_class(c):
        w_s_c = m_s[:, c]
        sel_t = m_t[:, c]
        w_t_c = noisy_scores * sel_t  # sample-level attention (utils.py:614)
        member = jnp.concatenate([w_s_c > 0, sel_t > 0])
        ss, tt, st = weighted_mmd_terms(
            l2,
            jnp.concatenate([w_s_c, zeros_t]),
            jnp.concatenate([zeros_s, w_t_c]),
            member,
            cfg.kernel_mul,
            cfg.kernel_num,
        )
        mmd = ss + tt - 2.0 * st
        diff = noisy_emb - centroids[c][None, :]
        compact = jnp.sum(jnp.sum(diff * diff, axis=-1) * sel_t) / jnp.maximum(
            counts_t[c], 1.0
        )
        ecda_c = (
            mmd
            + cfg.compactness_weight_gamma * compact
            + cfg.repulsion_weight_delta * repulsion
        )
        gate = (counts_s[c] >= 2) & (counts_t[c] >= 2)
        return jnp.where(gate, attention[c] * ecda_c, 0.0)

    return jnp.sum(jax.vmap(per_class)(jnp.arange(C)))
