"""Device mesh and sharding specs.

The reference has no distributed support at all (SURVEY.md §2.5: single
process, single GPU, no torch.distributed). The TPU-native design scales two
ways:
- ``dp``: batch sharding for both the DAD step and the feature-extraction
  forward (gradient all-reduce is inserted by XLA over ICI),
- ``tp``: tensor parallelism over the emotion2vec transformer's heads/MLP
  hidden dim for the extraction forward.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    tp: int = 1,
    axis_names: Sequence[str] = ("dp", "tp"),
) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if n % tp != 0:
        raise ValueError(f"n_devices={n} not divisible by tp={tp}")
    if len(devices) < n:
        raise ValueError(
            f"make_mesh: need {n} devices, have {len(devices)} "
            f"({devices[0].platform!r} platform). For multi-chip dry runs on "
            "a single-chip host, force a virtual CPU platform first "
            "(JAX_PLATFORMS=cpu + --xla_force_host_platform_device_count=N "
            "before backend init; see tests/conftest.py)."
        )
    axis_names = tuple(axis_names)
    if len(axis_names) == 1:
        grid = np.array(devices[:n])
    else:
        grid = np.array(devices[:n]).reshape(n // tp, tp)
    return Mesh(grid, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard dim 0 (batch) over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def _encoder_leaf_spec(path: str, shape) -> P:
    """Tensor-parallel layout for Emotion2vecEncoder params.

    - attention qkv kernel (C, 3C): split output features over tp
    - attention proj kernel (C, C): split input features over tp
    - mlp fc1 kernel (C, H): split hidden over tp; fc2 (H, C): split input
    - conv stacks / layernorms / biases of row-parallel layers: replicated
    """
    if "attn" in path and "qkv" in path and "kernel" in path:
        return P(None, "tp")
    if "attn" in path and "qkv" in path and "bias" in path:
        return P("tp")
    if "attn" in path and "proj" in path and "kernel" in path:
        return P("tp", None)
    if "mlp" in path and "fc1" in path and "kernel" in path:
        return P(None, "tp")
    if "mlp" in path and "fc1" in path and "bias" in path:
        return P("tp")
    if "mlp" in path and "fc2" in path and "kernel" in path:
        return P("tp", None)
    return P()


def encoder_param_sharding(mesh: Mesh, params):
    """NamedSharding tree for the encoder param pytree under ``mesh``.
    On a dp-only mesh (no 'tp' axis) everything is replicated."""
    has_tp = "tp" in mesh.axis_names

    def one(path, leaf):
        if not has_tp:
            return NamedSharding(mesh, P())
        pathstr = "/".join(str(getattr(k, "key", k)) for k in path)
        return NamedSharding(mesh, _encoder_leaf_spec(pathstr, leaf.shape))

    return jax.tree_util.tree_map_with_path(one, params)
