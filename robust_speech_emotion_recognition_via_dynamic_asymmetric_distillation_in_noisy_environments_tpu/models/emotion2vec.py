"""emotion2vec (data2vec-multi audio) encoder — the features_only path.

Rebuilds the only model path the reference pipeline exercises
(emotion2vec.py:97-188 with mask=False, features_only=True):

    wav -> conv feature extractor -> LN -> proj(512->768)
        -> + grouped-conv positional encoding
        -> prenet LN + 4 AltBlocks (post-LN)
        -> 8 AltBlocks (post-LN)

All dropout paths exist but run deterministic for extraction, exactly like the
reference's ``model.eval()`` usage. Waveform layer-norm pre-processing
(emotion2vec_speech_features.py:69-70) is exposed as ``normalize_wav``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import EncoderConfig
from .layers import (
    AltBlock,
    ConvFeatureExtractor,
    PositionalConv,
    alibi_bias,
    convert_padding_mask,
    make_norm,
)


def normalize_wav(wav: jax.Array, padding_mask: Optional[jax.Array] = None) -> jax.Array:
    """Whole-waveform layer norm (zero mean / unit var, no affine), matching
    ``F.layer_norm(source, source.shape)`` in the extraction CLI. With a
    padding mask, statistics are computed over valid samples only."""
    if padding_mask is None:
        mean = jnp.mean(wav, axis=-1, keepdims=True)
        var = jnp.var(wav, axis=-1, keepdims=True)
    else:
        keep = (~padding_mask).astype(wav.dtype)
        n = jnp.clip(jnp.sum(keep, axis=-1, keepdims=True), 1.0, None)
        mean = jnp.sum(wav * keep, axis=-1, keepdims=True) / n
        var = jnp.sum(((wav - mean) * keep) ** 2, axis=-1, keepdims=True) / n
    return (wav - mean) / jnp.sqrt(var + 1e-5)


class Emotion2vecEncoder(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(
        self,
        wav: jax.Array,  # (B, T) waveform at 16 kHz
        padding_mask: Optional[jax.Array] = None,  # (B, T) bool True=pad
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)

        # local encoder (audio.py:66-71)
        x = ConvFeatureExtractor(
            conv_layers=cfg.conv_feature_layers,
            dtype=dtype,
            fast_norm=cfg.fast_conv_norm,
            gelu_approximate=cfg.gelu_approximate,
            fast_ln=cfg.fast_ln,
            name="local_encoder",
        )(wav)

        # project_features: LN(512) -> Dense(768) (audio.py:73-77)
        x = make_norm(cfg.fast_ln, 1e-5, "proj_ln")(x)
        x = nn.Dense(cfg.embed_dim, dtype=dtype, name="proj")(x.astype(dtype))

        frame_mask = None
        if padding_mask is not None:
            frame_mask = convert_padding_mask(
                padding_mask, x.shape[1], cfg.conv_feature_layers
            )

        # relative positional encoder, added residually (base.py:258-275)
        x = x + PositionalConv(
            embed_dim=cfg.embed_dim,
            depth=cfg.conv_pos_depth,
            width=cfg.conv_pos_width,
            groups=cfg.conv_pos_groups,
            dtype=dtype,
            gelu_approximate=cfg.gelu_approximate,
            fast_ln=cfg.fast_ln,
            name="pos_conv",
        )(x, frame_mask)

        # optional alibi positional bias (base.py:538-642; off in the
        # shipped config, which relies on the conv positional encoder)
        bias = None
        if cfg.use_alibi_encoder:
            bias = alibi_bias(
                x.shape[1], cfg.num_heads, cfg.alibi_scale, dtype
            )

        def run_block(x, name, ld_rate):
            blk = AltBlock(
                dim=cfg.embed_dim,
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                drop=cfg.encoder_dropout,
                attn_drop=cfg.attention_dropout,
                mlp_drop=cfg.activation_dropout,
                post_mlp_drop=cfg.post_mlp_drop,
                norm_eps=cfg.norm_eps,
                layer_norm_first=cfg.layer_norm_first,
                dtype=dtype,
                use_flash=cfg.use_flash_attention,
                gelu_approximate=cfg.gelu_approximate,
                fast_ln=cfg.fast_ln,
                fast_softmax=cfg.fast_softmax,
                cosine_attention=cfg.cosine_attention,
                name=name,
            )
            out = blk(x, frame_mask, bias, deterministic=deterministic)
            if deterministic or ld_rate <= 0:
                return out
            # layerdrop (modules.py:78-92): stochastic residual-skip of the
            # whole block. Under jit both branches are computed (static
            # graph) — here it is a regularizer, not a compute saver.
            keep = jax.random.bernoulli(self.make_rng("dropout"), 1.0 - ld_rate)
            return jnp.where(keep, out, x)

        # prenet context encoder: post-LN => LN applied BEFORE the blocks
        # (modules.py:72-75), then prenet_depth blocks
        x = make_norm(cfg.fast_ln, cfg.norm_eps, "prenet_ln")(x).astype(dtype)
        for i in range(cfg.prenet_depth):
            x = run_block(x, f"prenet_block_{i}", cfg.prenet_layerdrop)

        # main transformer (emotion2vec.py:136-158)
        for i in range(cfg.depth):
            x = run_block(x, f"block_{i}", cfg.layerdrop)

        # layer_norm_first=False => no final norm (emotion2vec.py:77-79)
        return x, frame_mask


def init_encoder(cfg: EncoderConfig, key: jax.Array, example_len: int = 16000):
    model = Emotion2vecEncoder(cfg)
    params = model.init(key, jnp.zeros((1, example_len), jnp.float32))
    return model, params


def extract_features(
    model: Emotion2vecEncoder,
    params,
    wav: jax.Array,
    padding_mask: Optional[jax.Array] = None,
    normalize: Optional[bool] = None,
):
    """Counterpart of Data2VecMultiModel.extract_features (emotion2vec.py:177)."""
    cfg = model.cfg
    if normalize is None:
        normalize = cfg.normalize_input
    if normalize:
        wav = normalize_wav(wav, padding_mask)
    return model.apply(params, wav, padding_mask)
