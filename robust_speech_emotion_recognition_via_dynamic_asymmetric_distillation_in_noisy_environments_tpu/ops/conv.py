"""Pallas fused conv+LayerNorm+GELU kernel for the wav2vec2-style front end.

XLA's native conv runs the 7-layer extractor at ~25% MXU (PERFORMANCE.md);
patch-materializing reformulations are worse because they read the input k
times. This kernel reads each input tile ONCE into VMEM and computes

    out[t] = GELU(LN( sum_j  x[t*s + j] @ W[j] ))

as k accumulated MXU matmuls over the VMEM-resident tile, writing the
normalized activation — one HBM round trip per layer instead of three.

Mosaic has no strided vector slices, so the stride-s decimation is done by a
free host-side relayout: x (B, L, C) -> (B, G, s*C) groups of s rows. Inside
the kernel, tap j is then the CONTIGUOUS slice groups[j//s : j//s + tile,
(j%s)*C : (j%s+1)*C]. Each grid cell DMAs its tile plus a halo of
(k-1)//s group rows.

Pallas TPU also lacks erf/erfc lowering, so the kernel carries a polynomial
erf (Abramowitz-Stegun 7.1.26, |err| <= 1.5e-7 — far below bf16 ulp).

Constraints: VALID padding, any k/s with k >= s; C_out should be a multiple
of 128 for clean tiling (the emotion2vec spec is 512).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_erf(x):
    """Exact-formulation GELU via the polynomial erf (matches
    jax.nn.gelu(approximate=False) to ~1e-6)."""
    return x * 0.5 * (1.0 + _erf(x * 0.7071067811865476))


def _gelu_tanh(x):
    """tanh-approximate GELU — the fast path (see PERFORMANCE.md: exact erf
    costs ~2x on this TPU, and the approximation error sits at the bf16
    noise floor)."""
    c = 0.7978845608028654  # sqrt(2/pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _gelu(x, approximate):
    return _gelu_tanh(x) if approximate else _gelu_erf(x)


def _compute_tile(x, w_ref, scale_ref, bias_ref, o_ref, *, k, s, tile, c_in,
                  approx_gelu=False):
    acc = None
    for j in range(k):
        g0 = j // s
        c0 = (j % s) * c_in
        xj = x[g0 : g0 + tile, c0 : c0 + c_in]
        part = jax.lax.dot_general(
            xj, w_ref[j], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part

    # fused LayerNorm (f32 statistics) + GELU
    mean = jnp.mean(acc, axis=-1, keepdims=True)
    var = jnp.mean((acc - mean) ** 2, axis=-1, keepdims=True)
    normed = (acc - mean) * jax.lax.rsqrt(var + 1e-5)
    normed = normed * scale_ref[0][None, :] + bias_ref[0][None, :]
    o_ref[0] = _gelu(normed, approx_gelu).astype(o_ref.dtype)


def _kernel(x_hbm, w_ref, scale_ref, bias_ref, o_ref, x_vmem, sem, *, k, s,
            tile, halo_alloc, c_in, approx_gelu=False):
    b = pl.program_id(0)
    ti = pl.program_id(1)
    start = ti * tile

    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(start, tile + halo_alloc), :], x_vmem, sem
    )
    copy.start()
    copy.wait()
    _compute_tile(x_vmem[:], w_ref, scale_ref, bias_ref, o_ref,
                  k=k, s=s, tile=tile, c_in=c_in, approx_gelu=approx_gelu)


def _kernel_db(x_hbm, w_ref, scale_ref, bias_ref, o_ref, x_vmem, sems, *, k,
               s, tile, halo_alloc, c_in, approx_gelu=False):
    """Double-buffered variant: grid cells run sequentially per core, so the
    2-slot scratch persists across iterations — each cell kicks off the NEXT
    cell's HBM->VMEM DMA before computing on the current slot (the guide's
    double-buffering pattern)."""
    b = pl.program_id(0)
    ti = pl.program_id(1)
    n_b = pl.num_programs(0)
    n_t = pl.num_programs(1)
    rows = tile + halo_alloc
    # slot parity follows the GLOBAL linear cell index so it alternates
    # correctly across the b-boundary wrap
    linear = b * n_t + ti
    slot = jax.lax.rem(linear, 2)
    nxt_slot = jax.lax.rem(linear + 1, 2)

    def dma_for(bb, tt, sl):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(tt * tile, rows), :],
            x_vmem.at[sl],
            sems.at[sl],
        )

    @pl.when(linear == 0)
    def _():
        dma_for(b, ti, slot).start()

    # prefetch the next grid cell's tile (wrap ti across the batch dim)
    last_t = ti == n_t - 1
    nb = jnp.where(last_t, b + 1, b)
    nt = jnp.where(last_t, 0, ti + 1)

    @pl.when(nb < n_b)
    def _():
        dma_for(nb, nt, nxt_slot).start()

    dma_for(b, ti, slot).wait()
    _compute_tile(x_vmem[slot], w_ref, scale_ref, bias_ref, o_ref,
                  k=k, s=s, tile=tile, c_in=c_in, approx_gelu=approx_gelu)


def _kernel_mb(x_hbm, w_ref, scale_ref, bias_ref, o_ref, x_vmem, sems, *, k,
               s, tile, halo_alloc, c_in, bb, approx_gelu=False):
    """Multi-batch double-buffered variant: each grid cell processes ``bb``
    batch rows at once, folding them into the matmul M dimension — 8x fewer
    grid cells and (bb*tile)-row MXU calls."""
    gb = pl.program_id(0)
    ti = pl.program_id(1)
    n_gb = pl.num_programs(0)
    n_t = pl.num_programs(1)
    rows = tile + halo_alloc
    linear = gb * n_t + ti
    slot = jax.lax.rem(linear, 2)
    nxt_slot = jax.lax.rem(linear + 1, 2)

    def dma_for(gg, tt, sl):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(gg * bb, bb), pl.ds(tt * tile, rows), :],
            x_vmem.at[sl],
            sems.at[sl],
        )

    @pl.when(linear == 0)
    def _():
        dma_for(gb, ti, slot).start()

    last_t = ti == n_t - 1
    ng = jnp.where(last_t, gb + 1, gb)
    nt = jnp.where(last_t, 0, ti + 1)

    @pl.when(ng < n_gb)
    def _():
        dma_for(ng, nt, nxt_slot).start()

    dma_for(gb, ti, slot).wait()
    x = x_vmem[slot]  # (bb, rows, s*c_in)
    acc = None
    for j in range(k):
        g0 = j // s
        c0 = (j % s) * c_in
        xj = x[:, g0 : g0 + tile, c0 : c0 + c_in].reshape(bb * tile, c_in)
        part = jax.lax.dot_general(
            xj, w_ref[j], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part

    mean = jnp.mean(acc, axis=-1, keepdims=True)
    var = jnp.mean((acc - mean) ** 2, axis=-1, keepdims=True)
    normed = (acc - mean) * jax.lax.rsqrt(var + 1e-5)
    normed = normed * scale_ref[0][None, :] + bias_ref[0][None, :]
    o_ref[...] = _gelu(normed, approx_gelu).reshape(bb, tile, -1).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "s", "tile", "interpret", "double_buffer", "batch_block",
        "approx_gelu",
    ),
)
def fused_conv_ln_gelu(
    x: jax.Array,  # (B, L, C)
    w: jax.Array,  # (k, C, Cout) — conv taps as k matmul weights
    scale: jax.Array,  # (Cout,)
    bias: jax.Array,  # (Cout,)
    k: int,
    s: int,
    tile: int = 512,
    interpret: Optional[bool] = None,
    double_buffer: bool = True,
    batch_block: int = 1,
    approx_gelu: bool = False,
) -> jax.Array:
    """VALID conv (stride s) + LayerNorm + GELU in one kernel."""
    orig_b = x.shape[0]
    if batch_block > 1 and x.shape[0] % batch_block:
        pad_b = (-x.shape[0]) % batch_block
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
    B, L, C = x.shape
    Cout = w.shape[-1]
    t_out = (L - k) // s + 1
    n_tiles = -(-t_out // tile)  # ceil
    halo = (k - 1) // s
    # Mosaic wants sublane-aligned (8-row) VMEM shapes; round the halo up
    halo_alloc = 0 if halo == 0 else -(-halo // 8) * 8

    # group rows by stride: (B, G, s*C); pad L so every tile+halo read is
    # in bounds
    g_needed = n_tiles * tile + halo_alloc
    l_needed = g_needed * s
    if l_needed > L:
        x = jnp.pad(x, ((0, 0), (0, l_needed - L), (0, 0)))
    else:
        x = x[:, :l_needed]
    grouped = x.reshape(B, g_needed, s * C)

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    if batch_block > 1:
        bb = batch_block
        kernel = functools.partial(
            _kernel_mb, k=k, s=s, tile=tile, halo_alloc=halo_alloc, c_in=C,
            bb=bb, approx_gelu=approx_gelu,
        )
        scratch = [
            pltpu.VMEM((2, bb, tile + halo_alloc, s * C), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        grid = (B // bb, n_tiles)
        out_spec = pl.BlockSpec((bb, tile, Cout), lambda g, t: (g, t, 0))
    elif double_buffer:
        kernel = functools.partial(
            _kernel_db, k=k, s=s, tile=tile, halo_alloc=halo_alloc, c_in=C,
            approx_gelu=approx_gelu,
        )
        scratch = [
            pltpu.VMEM((2, tile + halo_alloc, s * C), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        grid = (B, n_tiles)
        out_spec = pl.BlockSpec((1, tile, Cout), lambda b, t: (b, t, 0))
    else:
        kernel = functools.partial(
            _kernel, k=k, s=s, tile=tile, halo_alloc=halo_alloc, c_in=C,
            approx_gelu=approx_gelu,
        )
        scratch = [
            pltpu.VMEM((tile + halo_alloc, s * C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ]
        grid = (B, n_tiles)
        out_spec = pl.BlockSpec((1, tile, Cout), lambda b, t: (b, t, 0))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * tile, Cout), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # grouped x stays in HBM
            pl.BlockSpec((k, C, Cout), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((1, Cout), lambda b, t: (0, 0)),
            pl.BlockSpec((1, Cout), lambda b, t: (0, 0)),
        ],
        out_specs=out_spec,
        scratch_shapes=scratch,
        interpret=interpret,
    )(grouped, w, scale[None, :], bias[None, :])
    return out[:orig_b, :t_out]


def pallas_conv_stack(
    x: jax.Array,  # (B, T', C) output of the first conv layer's conv+LN+GELU
    params: dict,  # ConvFeatureExtractor param dict (conv_i / ln_i)
    conv_layers: Tuple[Tuple[int, int, int], ...],
    tile: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Runs layers 1..N-1 of the extractor with the fused kernel."""
    for i, (dim, k, s) in enumerate(conv_layers):
        if i == 0:
            continue  # layer 0 handled by the caller (C_in=1)
        w = params[f"conv_{i}"]["kernel"].astype(x.dtype)
        scale = params[f"ln_{i}"]["scale"].astype(jnp.float32)
        bias = params[f"ln_{i}"]["bias"].astype(jnp.float32)
        x = fused_conv_ln_gelu(x, w, scale, bias, k, s, tile=tile, interpret=interpret)
    return x
