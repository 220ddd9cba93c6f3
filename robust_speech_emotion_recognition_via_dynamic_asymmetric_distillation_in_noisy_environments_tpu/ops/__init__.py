from .masked import masked_mean_pool, masked_quantile, masked_softmax_stats
from .mmd import pairwise_sq_dists, weighted_mmd_terms
from .conv import fused_conv_ln_gelu, pallas_conv_stack

__all__ = [
    "masked_mean_pool",
    "masked_quantile",
    "masked_softmax_stats",
    "pairwise_sq_dists",
    "weighted_mmd_terms",
    "fused_conv_ln_gelu",
    "pallas_conv_stack",
]
