"""Numerics of the fused residual+LN(+GELU) Pallas kernel vs XLA/flax."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.ops.fused_norm import (
    fused_layernorm,
)


def xla_ref(x, scale=None, bias=None, residual=None, activation=None, eps=1e-6):
    z = x.astype(jnp.float32)
    if residual is not None:
        z = z + residual.astype(jnp.float32)
    mu = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(z * z, axis=-1, keepdims=True) - mu * mu
    y = (z - mu) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale + bias
    if activation == "gelu_tanh":
        y = jax.nn.gelu(y, approximate=True)
    return y.astype(x.dtype)


@pytest.mark.parametrize("with_res", [False, True])
@pytest.mark.parametrize("with_aff", [False, True])
@pytest.mark.parametrize("act", [None, "gelu_tanh"])
def test_fused_ln_forward(rng, with_res, with_aff, act):
    x = jnp.asarray(rng.normal(size=(3, 40, 128)).astype(np.float32))
    res = jnp.asarray(rng.normal(size=x.shape).astype(np.float32)) if with_res else None
    scale = jnp.asarray(rng.normal(size=(128,)).astype(np.float32)) if with_aff else None
    bias = jnp.asarray(rng.normal(size=(128,)).astype(np.float32)) if with_aff else None
    got = fused_layernorm(x, scale, bias, residual=res, activation=act, block_rows=32)
    want = xla_ref(x, scale, bias, residual=res, activation=act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_fused_ln_matches_flax_layernorm(rng):
    """Affine LN matches nn.LayerNorm (fast variance, f32 stats)."""
    x = jnp.asarray(rng.normal(size=(4, 17, 256)).astype(np.float32)) * 3 + 1
    ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
    params = ln.init(jax.random.PRNGKey(0), x)
    scale = params["params"]["scale"] * 0 + jnp.asarray(
        rng.normal(size=(256,)).astype(np.float32)
    )
    bias = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
    want = ln.apply({"params": {"scale": scale, "bias": bias}}, x)
    got = fused_layernorm(x, scale, bias, block_rows=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_fused_ln_ragged_rows(rng):
    """Row count not a multiple of block_rows: ragged edge stays correct."""
    x = jnp.asarray(rng.normal(size=(5, 13, 128)).astype(np.float32))
    got = fused_layernorm(x, block_rows=32)
    want = xla_ref(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_fused_ln_bf16_dtype_preserved(rng):
    x = jnp.asarray(rng.normal(size=(2, 32, 128)), jnp.bfloat16)
    res = jnp.asarray(rng.normal(size=x.shape), jnp.bfloat16)
    got = fused_layernorm(x, residual=res, block_rows=32)
    assert got.dtype == jnp.bfloat16
    want = xla_ref(x, residual=res)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=3e-2
    )


@pytest.mark.parametrize("with_res", [False, True])
@pytest.mark.parametrize("act", [None, "gelu_tanh"])
def test_fused_ln_grad(rng, with_res, act):
    """Custom VJP matches autodiff through the XLA reference."""
    x = jnp.asarray(rng.normal(size=(2, 24, 128)).astype(np.float32))
    res = jnp.asarray(rng.normal(size=x.shape).astype(np.float32)) if with_res else None
    scale = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    def loss_fused(x, res, scale, bias):
        out = fused_layernorm(
            x, scale, bias, residual=res, activation=act, block_rows=16
        )
        return jnp.sum(out * g)

    def loss_ref(x, res, scale, bias):
        return jnp.sum(xla_ref(x, scale, bias, residual=res, activation=act) * g)

    args = (x, res, scale, bias) if with_res else (x, None, scale, bias)
    if with_res:
        got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(*args)
        want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    else:
        got = jax.grad(lambda a, s, b: loss_fused(a, None, s, b), argnums=(0, 1, 2))(
            x, scale, bias
        )
        want = jax.grad(lambda a, s, b: loss_ref(a, None, s, b), argnums=(0, 1, 2))(
            x, scale, bias
        )
    for gg, ww in zip(got, want):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(ww), atol=3e-4, rtol=3e-4)
