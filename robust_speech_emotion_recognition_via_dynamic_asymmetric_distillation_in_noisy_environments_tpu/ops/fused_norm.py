"""Pallas TPU fused residual-add + LayerNorm (+ GELU) kernel.

Why: the encoder's step-time profile (PERFORMANCE.md) shows ~34 ms of the
62 ms fused step burned in XLA's standalone LN/elementwise fusions — the 24
per-block residual+LN instances at (B, N, 768) run ~10x above HBM roofline,
and the conv stack's LN+GELU fusions at (B, T', 512) ~2x above. These ops are
purely memory-bound; a Pallas kernel that does read-once/write-once at
bandwidth removes the gap without touching XLA's (already winning) matmuls.

One kernel covers all three encoder patterns (reference semantics from
fairseq modules.py:232-249 post-LN blocks, audio.py:63-102 conv stacks):
- ``fused_layernorm(x, scale, bias)``                      — plain affine LN
- ``fused_layernorm(x, scale, bias, residual=y)``          — LN(x + y)
- ``fused_layernorm(x, scale, bias, activation="gelu_tanh")`` — LN then GELU

Statistics are float32 with flax's fast-variance formula (E[x^2] - E[x]^2),
matching nn.LayerNorm(use_fast_variance=True) numerics. The backward pass is
a custom VJP in plain XLA ops (the production extract path is forward-only;
grads exist for completeness and head-through-encoder experiments).

Rows are independent, so the grid is 1-D over row blocks and ragged edges
are safe (out-of-range rows never contaminate in-range ones).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)
_GELU_C = 0.044715


def _gelu_tanh_f32(a):
    u = _SQRT_2_OVER_PI * (a + _GELU_C * a * a * a)
    return 0.5 * a * (1.0 + jnp.tanh(u))


def _make_kernel(has_residual: bool, has_affine: bool, activation: Optional[str], eps: float):
    def kernel(*refs):
        i = 0
        x_ref = refs[i]; i += 1
        res_ref = None
        if has_residual:
            res_ref = refs[i]; i += 1
        scale_ref = bias_ref = None
        if has_affine:
            scale_ref = refs[i]; i += 1
            bias_ref = refs[i]; i += 1
        o_ref = refs[i]

        z = x_ref[:].astype(jnp.float32)
        if res_ref is not None:
            z = z + res_ref[:].astype(jnp.float32)

        # Row reduction strategy: a naive jnp.mean(axis=-1) lowers to a
        # cross-lane shuffle reduce that caps the kernel at ~170 GB/s
        # (measured). Instead: (1) fold the C/128 lane tiles into one
        # (BR, 128) partial with cheap tile-aligned slices + vector adds,
        # (2) finish the 128-lane reduce as a tiny (BR,128)@(128,128)
        # ones-matmul on the MXU, (3) broadcast back with pltpu.repeat.
        C = z.shape[-1]
        ntiles = C // 128
        p1 = z[:, 0:128]
        p2 = z[:, 0:128] * z[:, 0:128]
        for t in range(1, ntiles):
            tile = z[:, t * 128 : (t + 1) * 128]
            p1 = p1 + tile
            p2 = p2 + tile * tile
        ones = jnp.ones((128, 128), jnp.float32)
        s1 = jax.lax.dot_general(
            p1, ones, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        s2 = jax.lax.dot_general(
            p2, ones, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        mu = s1 * (1.0 / C)
        var = s2 * (1.0 / C) - mu * mu
        inv = jax.lax.rsqrt(var + eps)
        if ntiles > 1:
            from jax.experimental.pallas import tpu as pltpu

            mu = pltpu.repeat(mu, ntiles, axis=1)
            inv = pltpu.repeat(inv, ntiles, axis=1)
        y = (z - mu) * inv
        if scale_ref is not None:
            y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
        if activation == "gelu_tanh":
            y = _gelu_tanh_f32(y)
        o_ref[:] = y.astype(o_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("activation", "eps", "block_rows", "interpret")
)
def _fused_ln_call(x, residual, scale, bias, activation, eps, block_rows, interpret):
    orig_shape = x.shape
    C = orig_shape[-1]
    M = 1
    for d in orig_shape[:-1]:
        M *= d
    x2 = x.reshape(M, C)
    has_res = residual is not None
    has_aff = scale is not None

    args = [x2]
    in_specs = [pl.BlockSpec((block_rows, C), lambda i: (i, 0))]
    if has_res:
        args.append(residual.reshape(M, C))
        in_specs.append(pl.BlockSpec((block_rows, C), lambda i: (i, 0)))
    if has_aff:
        args.append(scale.reshape(1, C))
        args.append(bias.reshape(1, C))
        in_specs.append(pl.BlockSpec((1, C), lambda i: (0, 0)))
        in_specs.append(pl.BlockSpec((1, C), lambda i: (0, 0)))

    out = pl.pallas_call(
        _make_kernel(has_res, has_aff, activation, eps),
        out_shape=jax.ShapeDtypeStruct((M, C), x.dtype),
        grid=(pl.cdiv(M, block_rows),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_rows, C), lambda i: (i, 0)),
        interpret=interpret,
    )(*args)
    return out.reshape(orig_shape)


def _reference_fwd_f32(x, residual, scale, bias, activation, eps):
    """XLA reference of the fused op, returning (y, z, x_hat, inv) in f32 —
    used by the custom backward (recompute, no residual saving)."""
    z = x.astype(jnp.float32)
    if residual is not None:
        z = z + residual.astype(jnp.float32)
    mu = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(z * z, axis=-1, keepdims=True) - mu * mu
    inv = jax.lax.rsqrt(var + eps)
    x_hat = (z - mu) * inv
    a = x_hat
    if scale is not None:
        a = a * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    y = _gelu_tanh_f32(a) if activation == "gelu_tanh" else a
    return y, x_hat, inv, a


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _fused_ln(x, residual, scale, bias, activation, eps, block_rows, interpret):
    return _fused_ln_call(x, residual, scale, bias, activation, eps, block_rows, interpret)


def _fused_ln_fwd(x, residual, scale, bias, activation, eps, block_rows, interpret):
    y = _fused_ln_call(x, residual, scale, bias, activation, eps, block_rows, interpret)
    return y, (x, residual, scale, bias)


def _fused_ln_bwd(activation, eps, block_rows, interpret, saved, g):
    x, residual, scale, bias = saved
    _y, x_hat, inv, a = _reference_fwd_f32(x, residual, scale, bias, activation, eps)
    g = g.astype(jnp.float32)
    if activation == "gelu_tanh":
        u = _SQRT_2_OVER_PI * (a + _GELU_C * a * a * a)
        t = jnp.tanh(u)
        da = 0.5 * (1.0 + t) + 0.5 * a * (1.0 - t * t) * _SQRT_2_OVER_PI * (
            1.0 + 3.0 * _GELU_C * a * a
        )
        g = g * da
    if scale is not None:
        d_scale = jnp.sum(g * x_hat, axis=tuple(range(x.ndim - 1))).astype(scale.dtype)
        d_bias = jnp.sum(g, axis=tuple(range(x.ndim - 1))).astype(bias.dtype)
        g_hat = g * scale.astype(jnp.float32)
    else:
        d_scale = d_bias = None
        g_hat = g
    m1 = jnp.mean(g_hat, axis=-1, keepdims=True)
    m2 = jnp.mean(g_hat * x_hat, axis=-1, keepdims=True)
    dz = inv * (g_hat - m1 - x_hat * m2)
    dx = dz.astype(x.dtype)
    d_res = dz.astype(residual.dtype) if residual is not None else None
    return dx, d_res, d_scale, d_bias


_fused_ln.defvjp(_fused_ln_fwd, _fused_ln_bwd)


def fused_layernorm(
    x: jax.Array,
    scale: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    residual: Optional[jax.Array] = None,
    activation: Optional[str] = None,
    eps: float = 1e-6,
    block_rows: int = 256,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """LN(x [+ residual]) [* scale + bias] [-> gelu_tanh], dtype-preserving.

    Requirements: last dim a multiple of 128 (lane width); scale/bias both
    present or both absent; activation in {None, "gelu_tanh"}.
    """
    if activation not in (None, "gelu_tanh"):
        raise ValueError(f"unsupported activation {activation!r}")
    if (scale is None) != (bias is None):
        raise ValueError("scale and bias must be given together")
    if x.shape[-1] % 128 != 0:
        raise ValueError(f"feature dim {x.shape[-1]} must be a multiple of 128")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    return _fused_ln(x, residual, scale, bias, activation, eps, block_rows, interpret)
