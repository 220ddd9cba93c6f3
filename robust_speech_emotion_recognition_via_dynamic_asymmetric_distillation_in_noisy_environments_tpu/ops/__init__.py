from .masked import masked_mean_pool, masked_quantile, masked_softmax_stats
from .mmd import pairwise_sq_dists, weighted_mmd_terms

__all__ = [
    "masked_mean_pool",
    "masked_quantile",
    "masked_softmax_stats",
    "pairwise_sq_dists",
    "weighted_mmd_terms",
]
