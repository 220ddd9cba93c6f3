"""Pairwise-distance and weighted multi-kernel MMD building blocks.

The reference materializes (N, N, D) difference tensors for pairwise L2
(utils.py:533-537) — O(N^2 D) memory. Here distances come from the Gram
matrix (one matmul on the MXU), and sample masks/weights make the per-class
subsetting shape-static.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def pairwise_sq_dists(x: jax.Array) -> jax.Array:
    """(N, D) -> (N, N) squared euclidean distances via the Gram expansion.

    Clamped at zero to kill negative round-off on the diagonal.
    """
    sq = jnp.sum(x * x, axis=-1)
    gram = x @ x.T
    d = sq[:, None] + sq[None, :] - 2.0 * gram
    return jnp.maximum(d, 0.0)


def weighted_mmd_terms(
    l2: jax.Array,  # (N, N) pairwise sq dists over concat(source, target)
    w_s: jax.Array,  # (N,) source weights (0 outside the source subset)
    w_t: jax.Array,  # (N,) target weights (0 outside the target subset)
    member: jax.Array,  # (N,) bool — rows participating in this MMD instance
    kernel_mul: float = 2.0,
    kernel_num: int = 5,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Attention-weighted multi-kernel MMD terms (reference utils.py:521-563).

    The bandwidth follows the reference: sum of pairwise distances over the
    participating block divided by (n^2 - n), detached from the graph, then
    scaled into a geometric ladder of ``kernel_num`` kernels. Returns
    (term_ss, term_tt, term_st); MMD = ss + tt - 2 * st.
    """
    member_f = member.astype(l2.dtype)
    pair = member_f[:, None] * member_f[None, :]
    n = jnp.sum(member_f)
    denom = jnp.maximum(n * n - n, 1.0)
    bandwidth = jax.lax.stop_gradient(jnp.sum(l2 * pair)) / denom
    bandwidth = bandwidth / (kernel_mul ** (kernel_num // 2))

    kernel = jnp.zeros_like(l2)
    for i in range(kernel_num):
        bw = bandwidth * (kernel_mul**i)
        kernel = kernel + jnp.exp(-l2 / (bw + 1e-8))

    def _term(wa: jax.Array, wb: jax.Array) -> jax.Array:
        w = wa[:, None] * wb[None, :]
        return jnp.sum(kernel * w) / (jnp.sum(w) + 1e-8)

    return _term(w_s, w_s), _term(w_t, w_t), _term(w_s, w_t)
