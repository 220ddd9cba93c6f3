"""int8-vs-bf16 matmul microbench at the fused step's transformer shapes.

PERFORMANCE.md round 2 concluded the step is FLOP-bound at this chip's
deliverable bf16 rate (~100-160 TF/s) and named int8 (hardware peak 2x bf16)
as the only big semantics-changing lever left. This measures whether XLA's
int8 dot emitter actually delivers on this backend before building a
quantized extraction mode:

  - bf16 dot (baseline)
  - int8 x int8 -> int32 dot with static weight scales (weight-only quant
    amortized offline) and the result dequant fused
  - the same including DYNAMIC per-tensor activation quantization (abs-max,
    the runtime cost a real quantized path pays)

Timing via host materialization (float(x)) — block_until_ready is unreliable
over the axon tunnel (.claude/skills/verify/SKILL.md).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

M = 64 * 199  # tokens per fused-step stream
SHAPES = [
    ("qkv", (M, 768, 2304)),
    ("attn_proj", (M, 768, 768)),
    ("fc1", (M, 768, 3072)),
    ("fc2", (M, 3072, 768)),
]


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))  # compile + sync
    t0 = time.time()
    for _i in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.time() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    rows = []
    for name, (m, k, n) in SHAPES:
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32), jnp.bfloat16)
        w_scale = jnp.float32(np.abs(np.asarray(w, np.float32)).max() / 127.0)
        w_q = jnp.asarray(
            np.clip(np.round(np.asarray(w, np.float32) / float(w_scale)),
                    -127, 127).astype(np.int8)
        )
        x_scale = jnp.float32(
            float(np.abs(np.asarray(x, np.float32)).max()) / 127.0
        )
        x_q = jnp.asarray(
            np.clip(np.round(np.asarray(x, np.float32) / float(x_scale)),
                    -127, 127).astype(np.int8)
        )

        @jax.jit
        def dot_bf16(x, w):
            return jnp.dot(x, w)

        @jax.jit
        def dot_int8(x_q, w_q, sx, sw):
            acc = jax.lax.dot_general(
                x_q, w_q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (acc.astype(jnp.float32) * (sx * sw)).astype(jnp.bfloat16)

        @jax.jit
        def dot_int8_dynamic(x, w_q, sw):
            sx = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) / sx), -127, 127
            ).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, w_q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (acc.astype(jnp.float32) * (sx * sw)).astype(jnp.bfloat16)

        t_bf16 = timeit(dot_bf16, x, w)
        t_i8 = timeit(dot_int8, x_q, w_q, x_scale, w_scale)
        t_i8d = timeit(dot_int8_dynamic, x, w_q, w_scale)
        tflop = 2 * m * k * n / 1e12
        rows.append(
            dict(
                shape=name,
                bf16_ms=round(1e3 * t_bf16, 3),
                bf16_tfs=round(tflop / t_bf16, 1),
                int8_ms=round(1e3 * t_i8, 3),
                int8_tops=round(tflop / t_i8, 1),
                int8_dyn_ms=round(1e3 * t_i8d, 3),
                speedup_static=round(t_bf16 / t_i8, 2),
                speedup_dynamic=round(t_bf16 / t_i8d, 2),
            )
        )
        print(rows[-1], flush=True)
    print("\n| shape | bf16 ms (TF/s) | int8 ms (TOP/s) | int8+dynquant ms | "
          "speedup (static/dyn) |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['shape']} | {r['bf16_ms']} ({r['bf16_tfs']}) | "
            f"{r['int8_ms']} ({r['int8_tops']}) | {r['int8_dyn_ms']} | "
            f"{r['speedup_static']}x / {r['speedup_dynamic']}x |"
        )


if __name__ == "__main__":
    sys.exit(main())
