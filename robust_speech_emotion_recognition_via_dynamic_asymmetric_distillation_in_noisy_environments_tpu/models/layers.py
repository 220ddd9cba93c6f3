"""flax building blocks for the emotion2vec (data2vec-multi audio) encoder.

Behavioral contract (verified against the reference torch modules in
tests/test_models_parity.py):
- conv feature extractor: wav2vec2 spec, 'layer_norm' mode — per-layer
  bias-free conv + affine channel LayerNorm + GELU (reference audio.py:63-71
  via fairseq ConvFeatureExtractionModel).
- grouped conv positional encoder, depth 5, width 95, groups 16
  (audio.py:79-102).
- AltBlock / AltAttention, post-LN variant (modules.py:184-322 with
  layer_norm_first=False per upstream/models/config.py:40).

Attention can route through the Pallas flash kernel (ops/attention.py) when
running on TPU; the XLA einsum path is the reference semantics.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# use_flash="auto" routes attention to the Pallas kernel for compiled
# shapes at or beyond this frame count. NB: on THIS chip (v5e) the XLA
# path measured faster at every probed length — 0.66x at 200 frames and
# 0.84x at 800/1500 frames (full fused step, PERFORMANCE.md round 5) — so
# "auto" stays off in every shipped config; the routing exists for
# hardware/model regimes where the streaming kernel wins, with the
# crossover parameterized here rather than hard-coded at call sites.
FLASH_AUTO_MIN_FRAMES = 512

# GELU: torch nn.GELU() default is the exact erf formulation. The tanh
# approximation is ~2x faster on this TPU (XLA's erf lowering costs ~10 ms on
# the conv stack alone, PERFORMANCE.md) with error at the bf16 noise floor —
# modules take `gelu_approximate` to opt in for the bf16 production path.
def _make_gelu(approximate: bool):
    return lambda x: jax.nn.gelu(x, approximate=approximate)


_gelu = _make_gelu(False)


def big_neg(dtype) -> float:
    return float(jnp.finfo(dtype).min) / 2


class FastLayerNorm(nn.Module):
    """LayerNorm with f32 statistics but compute-dtype normalize arithmetic.

    The step-time profile (PERFORMANCE.md round 2) shows XLA's LN emission —
    convert-to-f32 + lane reduce + f32 normalize — eating ~2/3 of the fused
    step. Keeping the statistics in f32 (numerical safety) while doing the
    subtract/scale/shift in the compute dtype cuts the op's VPU work ~30%
    (measured 5.24 -> 3.73 ms at (64,12799,512) bf16). Deviation vs the f32
    reference path is at the bf16 rounding floor.

    Parameter names/shapes match nn.LayerNorm, so checkpoints are
    interchangeable between the fast and reference paths.
    """

    epsilon: float = 1e-6
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        z = x.astype(jnp.float32)
        mu = jnp.mean(z, axis=-1, keepdims=True)
        var = jnp.mean(z * z, axis=-1, keepdims=True) - mu * mu
        inv = jax.lax.rsqrt(var + self.epsilon)
        y = (x - mu.astype(x.dtype)) * inv.astype(x.dtype)
        if self.use_scale:
            s = self.param(
                "scale", nn.initializers.ones_init(), (x.shape[-1],), jnp.float32
            )
            y = y * s.astype(x.dtype)
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros_init(), (x.shape[-1],), jnp.float32
            )
            y = y + b.astype(x.dtype)
        return y


def make_norm(
    fast: bool,
    eps: float,
    name: Optional[str] = None,
    use_scale: bool = True,
    use_bias: bool = True,
    stat_dtype=jnp.float32,
):
    """Reference-path nn.LayerNorm (f32) or the FastLayerNorm variant."""
    if fast:
        return FastLayerNorm(
            epsilon=eps, use_scale=use_scale, use_bias=use_bias, name=name
        )
    return nn.LayerNorm(
        epsilon=eps, dtype=stat_dtype, use_scale=use_scale, use_bias=use_bias,
        name=name,
    )


class ConvFeatureExtractor(nn.Module):
    """wav2vec2-style conv stack: (B, T) waveform -> (B, T', C).

    ``fast_norm`` keeps the per-layer LayerNorms in the compute dtype
    (bf16): the early conv layers produce ~GB-scale activations at 50x the
    frame rate, so f32 normalization there is pure HBM-bandwidth waste. The
    reference's Fp32LayerNorm behavior (f32 statistics) is kept when
    ``fast_norm=False`` — the float32 parity tests run that way.
    """

    conv_layers: Sequence[Tuple[int, int, int]]
    dtype: jnp.dtype = jnp.float32
    fast_norm: bool = False
    gelu_approximate: bool = False
    fast_ln: bool = False

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        _gelu = _make_gelu(self.gelu_approximate)
        x = wav[:, :, None].astype(self.dtype)
        ln_dtype = self.dtype if self.fast_norm else jnp.float32
        for i, (dim, kernel, stride) in enumerate(self.conv_layers):
            x = nn.Conv(
                features=dim,
                kernel_size=(kernel,),
                strides=(stride,),
                padding="VALID",
                use_bias=False,
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            # fairseq Fp32LayerNorm: normalize in float32 (unless fast_norm /
            # fast_ln, which keep f32 statistics only)
            x = make_norm(
                self.fast_ln, 1e-5, f"ln_{i}", stat_dtype=ln_dtype
            )(x)
            x = _gelu(x).astype(self.dtype)
        return x


def conv_out_lengths(
    lengths: jax.Array, conv_layers: Sequence[Tuple[int, int, int]]
) -> jax.Array:
    """Output lengths through the conv stack (reference audio.py:141-156)."""
    out = lengths
    for _dim, kernel, stride in conv_layers:
        out = jnp.floor((out - kernel) / stride + 1).astype(jnp.int32)
    return out


def convert_padding_mask(
    padding_mask: jax.Array,  # (B, T) bool True=pad, at waveform rate
    out_t: int,
    conv_layers: Sequence[Tuple[int, int, int]],
) -> jax.Array:
    """Waveform-rate padding mask -> frame-rate mask (audio.py:140-182)."""
    in_lengths = jnp.sum(~padding_mask, axis=-1)
    out_lengths = conv_out_lengths(in_lengths, conv_layers)
    frame_idx = jnp.arange(out_t)[None, :]
    return frame_idx >= out_lengths[:, None]


class PositionalConv(nn.Module):
    """Depth-5 grouped-conv relative positional encoder (audio.py:79-102)."""

    embed_dim: int
    depth: int = 5
    width: int = 95
    groups: int = 16
    dtype: jnp.dtype = jnp.float32
    gelu_approximate: bool = False
    fast_ln: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, frame_mask: Optional[jax.Array] = None
    ) -> jax.Array:
        _gelu = _make_gelu(self.gelu_approximate)
        """frame_mask: (B, T') bool True=pad. Padded frames are zeroed before
        every conv layer so a padded batch reproduces the reference's
        per-clip (unpadded) extraction exactly: per-clip torch pads the conv
        with zeros past the clip end, which is precisely what the re-zeroed
        padded region provides."""
        k = max(3, self.width // self.depth)
        pad = k // 2
        # torch SamePad(k) trims the trailing element only for even k.
        trim = 1 if k % 2 == 0 else 0
        keep = None
        if frame_mask is not None:
            keep = (~frame_mask).astype(x.dtype)[..., None]
        for i in range(self.depth):
            if keep is not None:
                x = x * keep
            x = nn.Conv(
                features=self.embed_dim,
                kernel_size=(k,),
                padding=[(pad, pad)],
                feature_group_count=self.groups,
                dtype=self.dtype,
                name=f"pos_conv_{i}",
            )(x)
            if trim:
                x = x[:, :-trim]
            x = make_norm(
                self.fast_ln, 1e-5, f"pos_ln_{i}", use_scale=False, use_bias=False
            )(x)
            x = _gelu(x).astype(self.dtype)
        return x


class Mlp(nn.Module):
    """timm-style MLP: fc1 -> GELU -> drop -> fc2 -> drop."""

    hidden_dim: int
    out_dim: int
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    gelu_approximate: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = _make_gelu(self.gelu_approximate)(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class AltAttention(nn.Module):
    """Multi-head self-attention with fused qkv (modules.py:252-322).

    ``cosine_attention=True`` uses L2-normalized q/k with a learned per-head
    logit scale clamped at log(1/0.01) (modules.py:274-300) — the Swin-v2
    style branch the reference carries behind ``cosine_attention`` (dead with
    the shipped config, ported for config-completeness)."""

    dim: int
    num_heads: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_flash: Union[bool, str] = False
    # softmax in the compute dtype (max-subtracted, exp in f32): halves the
    # materialized (B,H,N,N) score traffic — the single largest step cost.
    # Deviation vs the f32 path is at the bf16 rounding floor.
    fast_softmax: bool = False
    cosine_attention: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, N, C)
        padding_mask: Optional[jax.Array] = None,  # (B, N) bool True=pad
        bias: Optional[jax.Array] = None,  # (B, H, N, N) additive bias
        deterministic: bool = True,
    ) -> jax.Array:
        B, N, C = x.shape
        H = self.num_heads
        head_dim = C // H
        scale = head_dim**-0.5

        qkv = nn.Dense(C * 3, use_bias=True, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, Dh)

        # the Pallas kernel computes softmax internally and cannot drop
        # attention weights; when training with attention dropout active we
        # must take the XLA path or silently lose regularization.
        # "auto": N is static under jit, so routing per compiled shape is
        # free — XLA's fused attention wins at short SER lengths, the
        # Pallas kernel at the 800+ frame buckets the product-scale length
        # mix promotes batches to (PERFORMANCE.md round 5)
        want_flash = self.use_flash is True or (
            self.use_flash == "auto" and N >= FLASH_AUTO_MIN_FRAMES
        )
        flash_ok = (
            want_flash and bias is None and not self.cosine_attention
            and (deterministic or self.attn_drop == 0.0)
        )
        if flash_ok:
            from ..ops.attention import flash_attention

            out = flash_attention(
                q.transpose(0, 2, 1, 3) * scale,
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                padding_mask=padding_mask,
            ).transpose(0, 2, 1, 3)
        else:
            if self.cosine_attention:
                logit_scale = self.param(
                    "logit_scale",
                    lambda _key, shape: jnp.log(10.0) * jnp.ones(shape, jnp.float32),
                    (H, 1, 1),
                )
                qn = q / jnp.clip(
                    jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12, None
                )
                kn = k / jnp.clip(
                    jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12, None
                )
                attn = jnp.einsum("bnhd,bmhd->bhnm", qn, kn)
                s = jnp.exp(
                    jnp.clip(logit_scale, None, jnp.log(1.0 / 0.01))
                ).astype(attn.dtype)
                attn = attn * s[None]
            else:
                attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
            if bias is not None:
                attn = attn + bias
            if padding_mask is not None:
                attn = jnp.where(
                    padding_mask[:, None, None, :], big_neg(attn.dtype), attn
                )
            if self.fast_softmax:
                m = jnp.max(attn, axis=-1, keepdims=True)
                e = jnp.exp((attn - m).astype(jnp.float32)).astype(self.dtype)
                attn = e / jnp.sum(e, axis=-1, keepdims=True)
            else:
                attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
                    self.dtype
                )
            attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)

        out = out.reshape(B, N, C)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class AltBlock(nn.Module):
    """Transformer block, post-LN variant (modules.py:232-249, else branch).

    ``return_ffn_target=True`` additionally returns the MLP output before
    post-dropout/norm2 — the per-layer target ``t`` the d2v teacher averages
    (modules.py:245 with ``ffn_targets=True``, i.e. end_of_block_targets
    False per upstream config.py:46)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop: float = 0.0  # encoder_dropout -> attn proj drop
    attn_drop: float = 0.0
    mlp_drop: float = 0.0
    post_mlp_drop: float = 0.0
    norm_eps: float = 1e-6
    layer_norm_first: bool = False
    dtype: jnp.dtype = jnp.float32
    use_flash: Union[bool, str] = False
    gelu_approximate: bool = False
    fast_ln: bool = False
    fast_softmax: bool = False
    return_ffn_target: bool = False
    cosine_attention: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        padding_mask: Optional[jax.Array] = None,
        bias: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        attn = AltAttention(
            dim=self.dim,
            num_heads=self.num_heads,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            dtype=self.dtype,
            use_flash=self.use_flash,
            fast_softmax=self.fast_softmax,
            cosine_attention=self.cosine_attention,
            name="attn",
        )
        norm1 = make_norm(self.fast_ln, self.norm_eps, "norm1")
        norm2 = make_norm(self.fast_ln, self.norm_eps, "norm2")
        mlp = Mlp(
            hidden_dim=int(self.dim * self.mlp_ratio),
            out_dim=self.dim,
            drop=self.mlp_drop,
            dtype=self.dtype,
            gelu_approximate=self.gelu_approximate,
            name="mlp",
        )
        post_drop = nn.Dropout(self.post_mlp_drop)

        if self.layer_norm_first:
            # mirrors the (quirky) fairseq pre-LN branch (modules.py:233-239)
            # where `r = x = self.mlp(...)` drops the residual; unused by the
            # shipped post-LN config but kept faithful.
            x = x + attn(norm1(x).astype(self.dtype), padding_mask, bias, deterministic)
            t = mlp(norm2(x).astype(self.dtype), deterministic)
            x = t + post_drop(t, deterministic=deterministic)
        else:
            x = x + attn(x, padding_mask, bias, deterministic)
            r = norm1(x).astype(self.dtype)
            t = mlp(r, deterministic)
            x = norm2(r + post_drop(t, deterministic=deterministic)).astype(self.dtype)
        if self.return_ffn_target:
            return x, t
        return x


# ---------------------------------------------------------------------------
# alibi positional bias (reference base.py:538-642; dead with the shipped
# audio config, which uses conv positional encoding — ported behind
# EncoderConfig.use_alibi_encoder for config-completeness)
# ---------------------------------------------------------------------------
def alibi_slopes(attention_heads: int) -> np.ndarray:
    """Per-head geometric slopes (base.py:544-561, incl. the non-power-of-2
    interleave workaround)."""
    import math

    def power_of_2(n):
        start = 2 ** (-(2 ** -(math.log2(n) - 3)))
        return [start * start**i for i in range(n)]

    if math.log2(attention_heads).is_integer():
        return np.array(power_of_2(attention_heads))
    closest = 2 ** math.floor(math.log2(attention_heads))
    extra = alibi_slopes(2 * closest)[0::2][: attention_heads - closest]
    return np.concatenate([power_of_2(closest), extra])


def alibi_bias(
    time_steps: int,
    attention_heads: int,
    scale: float = 1.0,
    dtype=jnp.float32,
) -> jax.Array:
    """(1, H, T, T) symmetric distance bias: slope_h * -|i - j| (base.py:
    563-604 dims=1 branch), broadcastable over the batch. wav2vec2-style
    non-autoregressive symmetric variant: 0 on the diagonal, linearly
    decreasing off it."""
    pos = np.arange(time_steps)
    dist = -np.abs(pos[None, :] - pos[:, None]).astype(np.float64)
    bias = alibi_slopes(attention_heads)[:, None, None] * dist[None]
    return (scale * jnp.asarray(bias, dtype=dtype))[None]
