#!/usr/bin/env python3
"""Microbench: XLA residual+LN fusions vs the Pallas fused_norm kernel on the
real TPU, at the two hot shapes from the step trace (PERFORMANCE.md):
- transformer block LN: (64, 199, 768) bf16, residual + affine LN
- conv stack LN+GELU:   (64, 3199, 512) bf16, affine LN + tanh GELU

Measurement per the axon rules (memory: axon-tpu-environment): K iterations
chained inside one jitted lax.scan (single dispatch), host materialization
via float() to sync.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.ops.fused_norm import (  # noqa: E402
    fused_layernorm,
)

K = 100


def xla_res_ln(x, res, scale, bias):
    z = x.astype(jnp.float32) + res.astype(jnp.float32)
    mu = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(z * z, axis=-1, keepdims=True) - mu * mu
    y = (z - mu) * jax.lax.rsqrt(var + 1e-6)
    return (y * scale + bias).astype(x.dtype)


def xla_ln_gelu(x, scale, bias):
    z = x.astype(jnp.float32)
    mu = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(z * z, axis=-1, keepdims=True) - mu * mu
    y = (z - mu) * jax.lax.rsqrt(var + 1e-6)
    y = y * scale + bias
    return jax.nn.gelu(y, approximate=True).astype(x.dtype)


def timed(name, fn, *args, traffic_bytes=0):
    out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))  # force through the tunnel
    t0 = time.time()
    out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.time() - t0) / K * 1e3
    gbps = traffic_bytes / (dt * 1e-3) / 1e9 if traffic_bytes else 0
    print(f"{name:<42} {dt:7.3f} ms/op   {gbps:6.0f} GB/s eff")
    return dt


def main():
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)

    # ---- shape 1: transformer residual+LN, bf16 (64,199,768)
    B, N, C = 64, 199, 768
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.bfloat16)
    res = jnp.asarray(rng.normal(size=(B, N, C)), jnp.bfloat16)
    scale = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
    traffic = B * N * C * 2 * 3  # read x, read res, write out (bf16)

    @jax.jit
    def run_xla1(x, res, scale, bias):
        def body(c, _):
            return xla_res_ln(c, res, scale, bias), ()
        out, _ = jax.lax.scan(body, x, None, length=K)
        return out

    @jax.jit
    def run_pallas1(x, res, scale, bias):
        def body(c, _):
            return fused_layernorm(c, scale, bias, residual=res), ()
        out, _ = jax.lax.scan(body, x, None, length=K)
        return out

    timed("XLA  res+LN (64,199,768) bf16", run_xla1, x, res, scale, bias, traffic_bytes=traffic)
    timed("Pallas res+LN (64,199,768) bf16 br=256", run_pallas1, x, res, scale, bias, traffic_bytes=traffic)

    @jax.jit
    def run_pallas1b(x, res, scale, bias):
        def body(c, _):
            return fused_layernorm(c, scale, bias, residual=res, block_rows=512), ()
        out, _ = jax.lax.scan(body, x, None, length=K)
        return out

    timed("Pallas res+LN (64,199,768) bf16 br=512", run_pallas1b, x, res, scale, bias, traffic_bytes=traffic)

    # ---- shape 2: conv LN+GELU, bf16 (64,3199,512)
    B2, T2, C2 = 64, 3199, 512
    x2 = jnp.asarray(rng.normal(size=(B2, T2, C2)), jnp.bfloat16)
    scale2 = jnp.asarray(rng.normal(size=(C2,)), jnp.float32)
    bias2 = jnp.asarray(rng.normal(size=(C2,)), jnp.float32)
    traffic2 = B2 * T2 * C2 * 2 * 2

    @jax.jit
    def run_xla2(x, scale, bias):
        def body(c, _):
            return xla_ln_gelu(c, scale, bias), ()
        out, _ = jax.lax.scan(body, x, None, length=K)
        return out

    @jax.jit
    def run_pallas2(x, scale, bias):
        def body(c, _):
            return fused_layernorm(c, scale, bias, activation="gelu_tanh", block_rows=512), ()
        out, _ = jax.lax.scan(body, x, None, length=K)
        return out

    timed("XLA  LN+GELU (64,3199,512) bf16", run_xla2, x2, scale2, bias2, traffic_bytes=traffic2)
    timed("Pallas LN+GELU (64,3199,512) bf16 br=512", run_pallas2, x2, scale2, bias2, traffic_bytes=traffic2)


if __name__ == "__main__":
    main()


def extra():
    """Ceiling checks: pure-copy bandwidth + kernel variants."""
    import functools
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(0)
    B2, T2, C2 = 64, 3199, 512
    x2 = jnp.asarray(rng.normal(size=(B2, T2, C2)), jnp.bfloat16)
    M = B2 * T2

    def copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    @functools.partial(jax.jit, static_argnames=("br",))
    def run_copy(x, br):
        x2d = x.reshape(M, C2)
        def body(c, _):
            out = pl.pallas_call(
                copy_kernel,
                out_shape=jax.ShapeDtypeStruct((M, C2), x.dtype),
                grid=(pl.cdiv(M, br),),
                in_specs=[pl.BlockSpec((br, C2), lambda i: (i, 0))],
                out_specs=pl.BlockSpec((br, C2), lambda i: (i, 0)),
            )(c)
            return out, ()
        out, _ = jax.lax.scan(body, x2d, None, length=K)
        return out

    traffic = M * C2 * 2 * 2
    for br in (256, 512, 1024, 2048):
        timed(f"Pallas copy (64,3199,512) bf16 br={br}",
              lambda x, br=br: run_copy(x, br), x2, traffic_bytes=traffic)

    @jax.jit
    def run_xla_copy(x):
        def body(c, _):
            return c * jnp.bfloat16(1.0000001), ()
        out, _ = jax.lax.scan(body, x, None, length=K)
        return out

    timed("XLA scale-copy (64,3199,512) bf16", run_xla_copy, x2, traffic_bytes=traffic)

    scale2 = jnp.asarray(rng.normal(size=(C2,)), jnp.float32)
    bias2 = jnp.asarray(rng.normal(size=(C2,)), jnp.float32)

    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.ops.fused_norm import fused_layernorm
    for br in (1024, 2048):
        @functools.partial(jax.jit, static_argnames=())
        def run_p(x, scale, bias, br=br):
            def body(c, _):
                return fused_layernorm(c, scale, bias, activation="gelu_tanh", block_rows=br), ()
            out, _ = jax.lax.scan(body, x, None, length=K)
            return out
        timed(f"Pallas LN+GELU (64,3199,512) br={br}", run_p, x2, scale2, bias2, traffic_bytes=traffic)


if __name__ == "__main__" and "--extra" in sys.argv:
    extra()
