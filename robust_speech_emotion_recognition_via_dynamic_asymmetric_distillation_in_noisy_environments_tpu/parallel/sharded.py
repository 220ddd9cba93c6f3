"""pjit-sharded DAD train step: dp batch sharding over the mesh.

Semantically identical to the single-chip step (the program is SPMD over a
global batch; XLA inserts the gradient all-reduce over ICI). DACP quantiles
and ECDA kernels see the GLOBAL batch, so multi-chip training is numerically
equivalent to a bigger single-chip batch. The static batch shapes from
``PaddedBatchIterator`` guarantee even dp splits (use a batch size divisible
by the dp extent).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configs import DADConfig
from ..dad.train_step import make_dad_train_step
from ..dad.train_step import DADTrainState
from ..models.heads import DADHead
from .mesh import replicated


def shard_dad_state(state: DADTrainState, mesh: Mesh) -> DADTrainState:
    """Replicates the (tiny) head/optimizer/DACP state across the mesh."""
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)


def _dp_put(mesh: Mesh, tree):
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P("dp", *([None] * (max(x.ndim, 1) - 1))))
        )
        if getattr(x, "ndim", 0) >= 1
        else x,
        tree,
    )


def make_sharded_dad_train_step(head: DADHead, tx, cfg: DADConfig, mesh: Mesh):
    """Wraps the jitted DAD step so batches land dp-sharded on the mesh and
    the state stays replicated."""
    base = make_dad_train_step(head, tx, cfg)

    def step(state, clean, noisy, scalars, anchors, key):
        clean = _dp_put(mesh, clean)
        noisy = _dp_put(mesh, noisy)
        return base(state, clean, noisy, scalars, anchors, key)

    return step
