from .mesh import (
    batch_sharding,
    encoder_param_sharding,
    make_mesh,
    replicated,
)
from .sharded import (
    make_sharded_dad_train_step,
    shard_dad_state,
)
from .fused import (
    CleanFeatureBatch,
    FusedBatch,
    FusedConfig,
    init_fused,
    make_fused_extract_train_step,
    precompute_clean_features,
)
from .d2v_sharded import (
    make_sharded_d2v_step,
    place_d2v_state,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "encoder_param_sharding",
    "make_sharded_dad_train_step",
    "shard_dad_state",
    "CleanFeatureBatch",
    "FusedBatch",
    "FusedConfig",
    "init_fused",
    "make_fused_extract_train_step",
    "precompute_clean_features",
    "make_sharded_d2v_step",
    "place_d2v_state",
]
