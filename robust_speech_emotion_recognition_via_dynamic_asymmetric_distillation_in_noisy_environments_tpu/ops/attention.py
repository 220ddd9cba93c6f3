"""Pallas TPU attention kernel for the emotion2vec encoder.

Utterance-level SER sequences are short (~<=2k frames at 50 Hz), so the
entire K/V for one (batch, head) pair fits comfortably in VMEM. The kernel
therefore streams q in row blocks and keeps K/V resident — one softmax(QK^T)V
per grid cell, with both matmuls on the MXU and the softmax in float32. This
avoids flash-attention's running-max bookkeeping, which only pays off for
sequence lengths where K/V exceed VMEM (not this workload).

Padding is handled with an additive f32 mask (1 = padded key). The wrapper
pads N up to a block multiple and slices the result, so any conv-output
length works. On non-TPU backends the kernel runs in interpret mode (tests),
so the numerics are verified against the XLA einsum path on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref):
    q = q_ref[0, 0]  # (BQ, D), pre-scaled
    k = k_ref[0, 0]  # (N, D)
    v = v_ref[0, 0]  # (N, D)
    mask = mask_ref[0, 0]  # (N,) f32, 1 = padded key

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, N)
    s = s + mask[None, :] * _NEG
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / denom).astype(v.dtype)
    o_ref[0, 0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def _flash_attention_padded(q, k, v, mask_f, block_q: int, interpret: bool):
    B, H, N, D = q.shape
    grid = (B, H, N // block_q)
    return pl.pallas_call(
        _attn_kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, N, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, N, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, N), lambda b, h, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
        interpret=interpret,
    )(q, k, v, mask_f)


def flash_attention(
    q: jax.Array,  # (B, H, N, D) — pre-scaled by 1/sqrt(D)
    k: jax.Array,
    v: jax.Array,
    padding_mask: Optional[jax.Array] = None,  # (B, N) bool True=pad
    block_q: int = 128,
) -> jax.Array:
    """softmax(q k^T + mask) v with the Pallas kernel. Returns (B, H, N, D)."""
    B, H, N, D = q.shape
    # TPU tiling wants the trailing dims 128-aligned; pad N up and slice back.
    bq = max(min(block_q, N), 1)
    if jax.devices()[0].platform == "tpu":
        bq = 128
    n_pad = (-N) % max(bq, 128 if jax.devices()[0].platform == "tpu" else bq)
    if padding_mask is None:
        mask_f = jnp.zeros((B, N), jnp.float32)
    else:
        mask_f = padding_mask.astype(jnp.float32)
    if n_pad:
        pad4 = ((0, 0), (0, 0), (0, n_pad), (0, 0))
        q = jnp.pad(q, pad4)
        k = jnp.pad(k, pad4)
        v = jnp.pad(v, pad4)
        mask_f = jnp.pad(mask_f, ((0, 0), (0, n_pad)), constant_values=1.0)
    interpret = jax.devices()[0].platform != "tpu"
    out = _flash_attention_padded(q, k, v, mask_f[:, None, :], bq, interpret)
    if n_pad:
        out = out[:, :, :N]
    return out
