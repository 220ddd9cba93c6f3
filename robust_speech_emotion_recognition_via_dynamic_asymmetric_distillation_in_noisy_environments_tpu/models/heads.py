"""Classification heads and the teacher-student (SSRL) model state.

- ``PretrainHead``: Linear 768->256 -> ReLU -> masked mean pool -> Linear
  256->4 (reference pretrain model.py:4-21; checkpoint keys pre_net/post_net).
- ``DADHead``: the same encoder half plus a dropout classifier, split so the
  DAD stage can take embeddings (reference DAD model.py:6-64).
- ``SSRLState``: student + teacher param trees as one pytree; the teacher is
  updated by EMA (model.py:211-223) — a pure ``tree_map`` lerp here.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.masked import masked_mean_pool


def _torch_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear weight init: kaiming_uniform(a=sqrt(5)) ==
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)). flax kernels are (in, out)."""
    bound = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_bias_init(fan_in: int):
    """torch nn.Linear bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    flax's bias_init only sees the (out,) shape, so fan_in is captured here.
    Matching the reference's init distributions matters for statistical
    accuracy parity (flax's default lecun_normal + zero bias trains to
    measurably different accuracy on short schedules)."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear(features: int, fan_in: int, name: str) -> nn.Dense:
    """nn.Dense with torch nn.Linear's default init (reference heads are
    plain torch Linears: pretrain model.py:4-21, DAD model.py:6-64)."""
    return nn.Dense(
        features,
        kernel_init=_torch_kernel_init,
        bias_init=_torch_bias_init(fan_in),
        name=name,
    )


class PretrainHead(nn.Module):
    """Supervised pretrain head; parameter names mirror the reference
    checkpoint layout (pre_net.*, post_net.*) for converter simplicity."""

    input_dim: int = 768
    hidden_dim: int = 256
    num_classes: int = 4

    @nn.compact
    def __call__(self, feats: jax.Array, padding_mask: jax.Array) -> jax.Array:
        x = torch_linear(self.hidden_dim, self.input_dim, "pre_net")(feats)
        x = nn.relu(x)
        x = masked_mean_pool(x, padding_mask)
        return torch_linear(self.num_classes, self.hidden_dim, "post_net")(x)


class DADEncoder(nn.Module):
    """Linear 768->256 + ReLU + masked mean pool (DAD model.py:6-41)."""

    input_dim: int = 768
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, feats: jax.Array, padding_mask: jax.Array) -> jax.Array:
        x = torch_linear(self.hidden_dim, self.input_dim, "pre_net")(feats)
        x = nn.relu(x)
        return masked_mean_pool(x, padding_mask)


class DADClassifier(nn.Module):
    """Dropout + Linear 256->C (DAD model.py:44-64). The teacher instance
    runs with dropout disabled (deterministic=True)."""

    hidden_dim: int = 256
    num_classes: int = 4
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return torch_linear(self.num_classes, self.hidden_dim, "fc_layer")(x)


class DADHead(nn.Module):
    """Encoder + classifier in one module; exposes embeddings too."""

    input_dim: int = 768
    hidden_dim: int = 256
    num_classes: int = 4
    dropout_rate: float = 0.1

    def setup(self):
        self.encoder = DADEncoder(self.input_dim, self.hidden_dim)
        self.classifier = DADClassifier(
            self.hidden_dim, self.num_classes, self.dropout_rate
        )

    def __call__(self, feats, padding_mask, deterministic: bool = True):
        emb = self.encoder(feats, padding_mask)
        logits = self.classifier(emb, deterministic=deterministic)
        return logits, emb

    def embed(self, feats, padding_mask):
        return self.encoder(feats, padding_mask)


class SSRLState(NamedTuple):
    """Student/teacher parameter pytrees (flax param dicts of ``DADHead``)."""

    student: Any
    teacher: Any


def init_ssrl(
    key: jax.Array,
    input_dim: int = 768,
    hidden_dim: int = 256,
    num_classes: int = 4,
    dropout_rate: float = 0.1,
):
    """Builds the DADHead module plus an SSRLState with teacher == student
    (reference model.py:200-209 _init_teacher_network)."""
    head = DADHead(input_dim, hidden_dim, num_classes, dropout_rate)
    feats = jnp.zeros((1, 4, input_dim), jnp.float32)
    mask = jnp.zeros((1, 4), bool)
    params = head.init(key, feats, mask)
    return head, SSRLState(student=params, teacher=jax.tree.map(jnp.copy, params))


def ema_update(state: SSRLState, momentum: float) -> SSRLState:
    """teacher <- m * teacher + (1 - m) * student (model.py:211-223)."""
    new_teacher = jax.tree.map(
        lambda t, s: t * momentum + s * (1.0 - momentum),
        state.teacher,
        state.student,
    )
    return SSRLState(student=state.student, teacher=new_teacher)


def load_pretrain_into_ssrl(state: SSRLState, pretrain_params) -> SSRLState:
    """Maps pretrain-head params into both student and teacher
    (model.py:143-209: pre_net -> encoder.pre_net, post_net -> fc_layer)."""
    pp = pretrain_params["params"]
    new = jax.tree.map(jnp.copy, state.student)
    new["params"]["encoder"]["pre_net"] = jax.tree.map(
        jnp.asarray, pp["pre_net"]
    )
    new["params"]["classifier"]["fc_layer"] = jax.tree.map(
        jnp.asarray, pp["post_net"]
    )
    return SSRLState(student=new, teacher=jax.tree.map(jnp.copy, new))
