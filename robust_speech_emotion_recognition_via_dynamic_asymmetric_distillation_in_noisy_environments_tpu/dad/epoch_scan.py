"""Whole-epoch lax.scan execution of the DAD train step.

The reference dispatches one Python-driven step per batch (train.py:479-496).
The DAD head is two linear layers, so per-step device compute is tiny and a
real run is dominated by dispatch latency — on a remote-attached TPU each
dispatch costs a round trip. This runner stacks an epoch's batches to one
bucket shape and scans the jitted step across them in a single XLA program:
one dispatch per epoch, with the DACP threshold EMA threaded through the scan
carry exactly as the reference updates it per batch.

Numerical equivalence with per-batch stepping is asserted in
tests/test_epoch_scan.py.
"""

from __future__ import annotations

from typing import Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs import DADConfig
from ..data.batching import Batch
from ..models.heads import DADHead
from .train_step import DADTrainState, StepScalars, make_dad_train_step


def stack_batches(batches: List[Batch], t_pad: int) -> Batch:
    """Stacks per-batch arrays to (S, B, ...) with every batch padded to the
    same frame count ``t_pad`` (padding frames are masked, so this is
    numerically inert)."""

    def pad_feats(x):
        return np.pad(x, ((0, 0), (0, t_pad - x.shape[1]), (0, 0)))

    def pad_mask(m):
        return np.pad(m, ((0, 0), (0, t_pad - m.shape[1])), constant_values=True)

    return Batch(
        feats=np.stack([pad_feats(b.feats) for b in batches]),
        padding_mask=np.stack([pad_mask(b.padding_mask) for b in batches]),
        labels=np.stack([b.labels for b in batches]),
        ids=np.stack([b.ids for b in batches]),
        row_valid=np.stack([b.row_valid for b in batches]),
    )


def make_dad_epoch_runner(head: DADHead, tx, cfg: DADConfig):
    """Returns run(state, clean_stacked, noisy_stacked, scalars, anchors, key)
    -> (state', metrics_mean, tracking_stacked).

    metrics are averaged over the scanned steps (like the reference's
    per-epoch loss averages, train.py:494-520); tracking arrays come back
    stacked (S, B) for confirmation-bias logging.
    """
    # the jitted step inlines when traced inside the scan body
    jitted_step = make_dad_train_step(head, tx, cfg)

    def epoch_body(carry, xs):
        state, scalars, anchors = carry
        clean, noisy, key = xs
        new_state, metrics, tracking = jitted_step(
            state, clean, noisy, scalars, anchors, key
        )
        return (new_state, scalars, anchors), (metrics, tracking)

    @jax.jit
    def run(
        state: DADTrainState,
        clean_stacked: Batch,
        noisy_stacked: Batch,
        scalars: StepScalars,
        anchors: jax.Array,
        key: jax.Array,
    ):
        S = clean_stacked.feats.shape[0]
        keys = jax.random.split(key, S)
        (state, _s, _a), (metrics, tracking) = jax.lax.scan(
            epoch_body,
            (state, scalars, anchors),
            (clean_stacked, noisy_stacked, keys),
        )
        mean_metrics = jax.tree.map(lambda x: jnp.mean(x), metrics)
        return state, mean_metrics, tracking

    return run
