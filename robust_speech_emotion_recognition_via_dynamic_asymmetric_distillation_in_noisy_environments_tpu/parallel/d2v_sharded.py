"""Data-parallel d2v pretraining over a device mesh.

The self-supervised pretraining stage (models/d2v_pretrain.py) is the
heaviest workload in the framework — the full encoder trains, unlike the
frozen-extraction DAD path — and it scales the classic way: replicate
params, shard the wav batch over ``dp``, and let XLA insert the gradient
all-reduce over ICI. Teacher EMA state is replicated alongside the params
(pure pytree lerp, no communication). Numerical note: the global batch is
what the loss normalizes over, so an N-chip run equals a 1-chip run at N×
batch (asserted in tests/test_parallel.py-style equivalence tests).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

from ..models.d2v_pretrain import D2vPretrainModel, D2vTrainState, make_d2v_train_step
from .mesh import batch_sharding, encoder_param_sharding, replicated


def place_d2v_state(state: D2vTrainState, mesh: Mesh) -> D2vTrainState:
    """Places the train state on the mesh.

    dp-only mesh: everything replicated (gradient all-reduce over ICI is
    all the communication). With a 'tp' axis: the student params, their
    EMA copies, and the AdamW moments are sharded with the same
    heads/MLP-hidden layout the extraction forward uses
    (mesh.encoder_param_sharding — the path rules key on attn/qkv/mlp
    names, so they apply to any params-shaped tree: optimizer mu/nu and
    ema_blocks included; conv/decoder/LN leaves and scalars replicate).
    GSPMD then partitions every block matmul fwd+bwd over tp and inserts
    the activation all-reduces, exactly like tp extraction."""

    def place(tree):
        sh = encoder_param_sharding(mesh, tree)
        return jax.tree.map(jax.device_put, tree, sh)

    return D2vTrainState(
        params=place(state.params),
        ema_blocks=place(state.ema_blocks),
        opt_state=place(state.opt_state),
        step=jax.device_put(state.step, replicated(mesh)),
    )


def make_sharded_d2v_step(model: D2vPretrainModel, tx, mesh: Mesh):
    """Returns step(state, wav (B,T), pad (B,T), key) with the batch
    dp-sharded; B must be divisible by the dp extent (static shapes from
    WavCropDataset guarantee even splits)."""
    base = make_d2v_train_step(model, tx)
    dp2 = batch_sharding(mesh, 2)

    def step(state, wav, pad, key):
        wav = jax.device_put(wav, dp2)
        pad = jax.device_put(pad, dp2)
        return base(state, wav, pad, key)

    return step
