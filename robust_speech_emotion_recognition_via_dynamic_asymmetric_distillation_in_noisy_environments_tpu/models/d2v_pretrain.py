"""TPU-native data2vec-2.0 self-supervised pretraining of the emotion2vec
encoder.

The reference repo ships only the inference half of Data2VecMultiModel: its
forward returns nothing unless ``features_only`` (upstream/models/
emotion2vec.py:97-175) and ``self.ema = None`` (:65). The masking/decoder
machinery that defines the pretrain checkpoint layout lives in base.py:74-519
and modules.py:126-181, with the training knobs in config.py:14-113. This
module rebuilds the full pretraining stage TPU-first:

- exact-count static-shape masking (models/d2v_masking.py), so the MAE-style
  masked-token REMOVAL path (base.py:262-272) — the d2v-2.0 efficiency trick
  where the student encoder only sees kept tokens — compiles to one
  fixed-shape XLA program per crop size;
- ``clone_batch`` multi-masking (emotion2vec.py:121): the teacher runs once
  per clip, the student sees ``clone_batch`` different masks of it;
- EMA teacher over the shared transformer blocks (``ema_encoder_only``,
  config.py:66-71) with annealed decay (base.py:477-482) and fp32 EMA state;
  the teacher's local/positional/prenet path reuses the student's parameters
  under stop_gradient, exactly like the reference design;
- targets = average of the top-K blocks' FFN outputs (modules.py:245 ``t``
  with ffn_targets=True), per-layer instance-normed (config.py:50-54),
  regressed at masked positions with the 1/sqrt(D)-scaled L2/smooth-L1 d2v
  loss (config.py:16-24);
- emotion2vec's utterance-level loss (config.py:92 ``cls_loss``,
  :110-113 ``cls_type=single``): valid-frame mean of the student prediction
  regressed onto the valid-frame mean of the target;
- ``Decoder1d``: grouped-conv decoder with residuals (modules.py:126-181) fed
  by mask-token restoration (base.py:157-187).

Param-tree contract: the student's encoder submodules carry the SAME names as
``Emotion2vecEncoder`` ("local_encoder", "proj_ln", "proj", "pos_conv",
"prenet_ln", "prenet_block_i", "block_i"), so ``encoder_params()`` of a
pretrained state loads directly into the extraction encoder (tested in
tests/test_d2v_pretrain.py).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from ..configs import D2vPretrainConfig, EncoderConfig
from .d2v_masking import (
    MaskInfo,
    apply_mask,
    gather_unmasked,
    gather_unmasked_mask,
    make_mask_info,
    restore_with_mask_tokens,
    sample_random_mask,
    sample_span_mask,
)
from .layers import (
    AltBlock,
    ConvFeatureExtractor,
    PositionalConv,
    convert_padding_mask,
    make_norm,
)


class Decoder1d(nn.Module):
    """Grouped-conv d2v decoder (reference modules.py:126-181).

    Per layer: Conv1d(groups) + SamePad + channel-LN (no affine) + GELU, with
    a residual add whenever channel counts match (the first layer's 768-ch
    input never matches the 384-ch output, modules.py:113-123), then the
    linear projection head back to ``input_dim``."""

    dcfg: Any  # D2vDecoderConfig
    input_dim: int
    dtype: jnp.dtype = jnp.float32
    fast_ln: bool = False  # honor EncoderConfig.fast_ln like every encoder norm

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dc = self.dcfg
        k = dc.decoder_kernel
        trim = 1 if k % 2 == 0 else 0  # torch SamePad semantics
        residual = x
        for i in range(dc.decoder_layers):
            x = nn.Conv(
                dc.decoder_dim,
                kernel_size=(k,),
                padding=[(k // 2, k // 2)],
                feature_group_count=dc.decoder_groups,
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            if trim:
                x = x[:, :-trim]
            x = make_norm(
                self.fast_ln, 1e-5, f"ln_{i}", use_scale=False, use_bias=False
            )(x)
            x = jax.nn.gelu(x, approximate=False).astype(self.dtype)
            if dc.decoder_residual and residual.shape[-1] == x.shape[-1]:
                x = x + residual
            residual = x
        curr = dc.decoder_dim
        for i in range(dc.projection_layers - 1):
            nxt = int(curr * dc.projection_ratio) if i == 0 else curr
            x = nn.Dense(nxt, dtype=self.dtype, name=f"proj_{i}")(x)
            x = jax.nn.gelu(x, approximate=False).astype(self.dtype)
            curr = nxt
        return nn.Dense(self.input_dim, dtype=self.dtype, name="proj_out")(x)


class D2vPretrainModel(nn.Module):
    """Student encoder + decoder with teacher-compatible methods.

    The teacher is the SAME module applied with a param tree whose main
    blocks are replaced by their EMA copies (``merge_teacher_params``)."""

    cfg: EncoderConfig
    pcfg: D2vPretrainConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        self.local_enc = ConvFeatureExtractor(
            conv_layers=c.conv_feature_layers,
            dtype=dtype,
            fast_norm=c.fast_conv_norm,
            gelu_approximate=c.gelu_approximate,
            fast_ln=c.fast_ln,
            name="local_encoder",
        )
        self.proj_norm = make_norm(c.fast_ln, 1e-5, name="proj_ln")
        self.proj_out = nn.Dense(c.embed_dim, dtype=dtype, name="proj")
        self.positional_conv = PositionalConv(
            embed_dim=c.embed_dim,
            depth=c.conv_pos_depth,
            width=c.conv_pos_width,
            groups=c.conv_pos_groups,
            dtype=dtype,
            gelu_approximate=c.gelu_approximate,
            fast_ln=c.fast_ln,
            name="pos_conv",
        )
        self.prenet_norm = make_norm(c.fast_ln, c.norm_eps, name="prenet_ln")

        # remat: recompute each block in the backward pass instead of
        # saving its activations — cuts the dominant HBM stream (student
        # activations at B*clone_batch rows) for extra MXU FLOPs.
        # deterministic (arg 4 incl. self) is a static python bool.
        block_cls = (
            nn.remat(AltBlock, static_argnums=(4,))
            if self.pcfg.remat_blocks
            else AltBlock
        )

        def blk(name):
            return block_cls(
                dim=c.embed_dim,
                num_heads=c.num_heads,
                mlp_ratio=c.mlp_ratio,
                drop=c.encoder_dropout,
                attn_drop=c.attention_dropout,
                mlp_drop=c.activation_dropout,
                post_mlp_drop=c.post_mlp_drop,
                norm_eps=c.norm_eps,
                layer_norm_first=c.layer_norm_first,
                dtype=dtype,
                use_flash=c.use_flash_attention,
                gelu_approximate=c.gelu_approximate,
                fast_ln=c.fast_ln,
                fast_softmax=c.fast_softmax,
                cosine_attention=c.cosine_attention,
                return_ffn_target=True,
                name=name,
            )

        self.prenet_blocks = [
            blk(f"prenet_block_{i}") for i in range(c.prenet_depth)
        ]
        self.main_blocks = [blk(f"block_{i}") for i in range(c.depth)]
        self.decoder = Decoder1d(
            dcfg=self.pcfg.decoder,
            input_dim=c.embed_dim,
            dtype=dtype,
            fast_ln=c.fast_ln,
            name="decoder",
        )

    # -- methods used by the train step (invoked via model.apply(method=..)) --
    def local_features(
        self, wav: jax.Array, padding_mask: Optional[jax.Array] = None
    ):
        """wav -> projected local features + frame-rate padding mask."""
        dtype = jnp.dtype(self.cfg.dtype)
        x = self.local_enc(wav)
        x = self.proj_out(self.proj_norm(x).astype(dtype))
        frame_mask = None
        if padding_mask is not None:
            frame_mask = convert_padding_mask(
                padding_mask, x.shape[1], self.cfg.conv_feature_layers
            )
        return x, frame_mask

    def positional(
        self, x: jax.Array, frame_mask: Optional[jax.Array] = None
    ) -> jax.Array:
        return self.positional_conv(x, frame_mask)

    def contextualize(
        self,
        x: jax.Array,
        frame_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ):
        """prenet LN + prenet blocks + main blocks; returns (x, per-main-block
        FFN targets) — the targets list feeds make_targets on the teacher."""
        dtype = jnp.dtype(self.cfg.dtype)
        x = self.prenet_norm(x).astype(dtype)
        # positional args: nn.remat's static_argnums only covers
        # positional parameters (bias arg 3 stays dynamic/None)
        for b in self.prenet_blocks:
            x, _ = b(x, frame_mask, None, deterministic)
        targets = []
        for b in self.main_blocks:
            x, t = b(x, frame_mask, None, deterministic)
            targets.append(t)
        return x, targets

    def decode(self, x: jax.Array) -> jax.Array:
        return self.decoder(x)

    def __call__(
        self,
        wav: jax.Array,
        padding_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ):
        """Unmasked full forward — used for module init (touches every
        submodule) and as a features_only path."""
        x, fm = self.local_features(wav, padding_mask)
        x = x + self.positional(x, fm)
        x, _ = self.contextualize(x, fm, deterministic)
        return x, self.decode(x)


# ---------------------------------------------------------------------------
# targets / losses
# ---------------------------------------------------------------------------
def _instance_norm_time(t: jax.Array, eps: float = 1e-5) -> jax.Array:
    """F.instance_norm over the TIME axis per (batch, channel) — the
    reference permutes to (B, C, T) first."""
    mu = t.mean(axis=1, keepdims=True)
    var = t.var(axis=1, keepdims=True)
    return (t - mu) / jnp.sqrt(var + eps)


def _layer_norm_lastdim(t: jax.Array, eps: float = 1e-5) -> jax.Array:
    mu = t.mean(axis=-1, keepdims=True)
    var = t.var(axis=-1, keepdims=True)
    return (t - mu) / jnp.sqrt(var + eps)


def make_targets(layer_targets, pcfg: D2vPretrainConfig) -> jax.Array:
    """Average of the top-K layers' FFN outputs with the configured
    normalizations (fairseq Data2VecMultiModel.make_targets semantics; knobs
    from reference config.py:42-54)."""
    tl = [t.astype(jnp.float32) for t in layer_targets[-pcfg.average_top_k_layers:]]
    if pcfg.instance_norm_target_layer:
        tl = [_instance_norm_time(t) for t in tl]
    if pcfg.layer_norm_target_layer:
        tl = [_layer_norm_lastdim(t) for t in tl]
    y = sum(tl) / len(tl)
    if pcfg.layer_norm_targets:
        y = _layer_norm_lastdim(y)
    if pcfg.instance_norm_targets:
        y = _instance_norm_time(y)
    return y


def d2v_loss(
    pred: jax.Array,
    target: jax.Array,
    weight: jax.Array,  # (...,) per-position weights, broadcast over last dim
    beta: float,
    scale: Optional[float],
) -> jax.Array:
    """1/sqrt(D)-scaled L2 (beta=0) or smooth-L1 regression, averaged over
    weighted positions (reference config.py:16-24 loss_beta/loss_scale)."""
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    if beta == 0:
        l = d * d
    else:
        a = jnp.abs(d)
        l = jnp.where(a < beta, 0.5 * d * d / beta, a - 0.5 * beta)
    if scale is None:
        scale = 1.0 / math.sqrt(pred.shape[-1])
    per_pos = l.sum(axis=-1) * scale
    w = weight.astype(jnp.float32)
    return (per_pos * w).sum() / jnp.clip(w.sum(), 1.0, None)


def compute_var(y: jax.Array, valid: Optional[jax.Array] = None) -> jax.Array:
    """sqrt(per-dim variance across tokens).mean() — the collapse telemetry
    behind min_target_var / min_pred_var (reference config.py:77-83).

    ``valid`` (bool, y's leading dims): restrict the token population. The
    reference computes this on the masked-EXTRACTED tokens only; padded or
    unmasked frames must not prop up a collapsing statistic. Unbiased
    variance like torch.var."""
    z = y.reshape(-1, y.shape[-1]).astype(jnp.float32)
    if valid is None:
        n = jnp.asarray(float(max(z.shape[0], 1)))
        mu = z.mean(axis=0)
        var = ((z - mu) ** 2).sum(axis=0) / jnp.clip(n - 1.0, 1.0, None)
    else:
        w = valid.reshape(-1, 1).astype(jnp.float32)
        n = jnp.clip(w.sum(), 1.0, None)
        mu = (z * w).sum(axis=0) / n
        var = (w * (z - mu) ** 2).sum(axis=0) / jnp.clip(n - 1.0, 1.0, None)
    return jnp.sqrt(var + 1e-6).mean()


def annealed_decay(pcfg: D2vPretrainConfig, step: jax.Array) -> jax.Array:
    """get_annealed_rate (base.py:477-482)."""
    start, end = pcfg.ema_decay, pcfg.ema_end_decay
    total = max(pcfg.ema_anneal_end_step, 1)
    frac = jnp.clip(step.astype(jnp.float32) / total, 0.0, 1.0)
    return end - (end - start) * (1.0 - frac)


# ---------------------------------------------------------------------------
# train state / step
# ---------------------------------------------------------------------------
class D2vTrainState(NamedTuple):
    params: Any  # full student params {"params": {...}}
    ema_blocks: Any  # fp32 EMA copies of the teacher-owned subtree
    opt_state: Any
    step: jax.Array


def _ema_keys(cfg: EncoderConfig, pcfg: D2vPretrainConfig, tree: dict):
    if pcfg.ema_encoder_only:
        return [f"block_{i}" for i in range(cfg.depth)]
    return [k for k in tree if k != "decoder"]


def init_ema_blocks(params, cfg: EncoderConfig, pcfg: D2vPretrainConfig):
    p = params["params"]
    dt = jnp.dtype(pcfg.ema_dtype)
    # copy=True: astype on an already-f32 leaf would ALIAS the student
    # buffer, and the donated train step may not receive the same buffer
    # twice (params + ema_blocks)
    return {
        k: jax.tree.map(lambda a: jnp.array(a, dt, copy=True), p[k])
        for k in _ema_keys(cfg, pcfg, p)
    }


def merge_teacher_params(params, ema_blocks):
    """Student params with the EMA'd blocks swapped in (cast back to the
    student dtype so the teacher runs in the same compute precision)."""
    p = dict(params["params"])
    for k, v in ema_blocks.items():
        p[k] = jax.tree.map(lambda e, s: e.astype(s.dtype), v, p[k])
    out = dict(params)
    out["params"] = p
    return out


def encoder_params(params) -> dict:
    """Drops the decoder: the result loads directly into
    Emotion2vecEncoder (same module names)."""
    return {"params": {k: v for k, v in params["params"].items() if k != "decoder"}}


def build_d2v_optimizer(pcfg: D2vPretrainConfig) -> optax.GradientTransformation:
    # optax needs decay_steps > warmup_steps; clamp warmup for runs shorter
    # than the configured warmup (smoke runs) without changing full runs.
    warmup = min(pcfg.warmup_steps, max(pcfg.max_steps - 1, 0))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, pcfg.learning_rate, warmup, max(pcfg.max_steps, warmup + 1)
    )
    return optax.chain(
        optax.clip_by_global_norm(pcfg.grad_clip),
        optax.adamw(
            sched,
            b1=pcfg.adam_betas[0],
            b2=pcfg.adam_betas[1],
            weight_decay=pcfg.weight_decay,
            # bf16 first-moment storage (adam_mu_dtype): halves the m-stream
            # HBM traffic; optax upcasts for the update math
            mu_dtype=pcfg.adam_mu_dtype,
        ),
    )


def init_d2v_state(
    cfg: EncoderConfig,
    pcfg: D2vPretrainConfig,
    key: jax.Array,
    example_len: int = 16000,
) -> Tuple[D2vPretrainModel, optax.GradientTransformation, D2vTrainState]:
    model = D2vPretrainModel(cfg, pcfg)
    k1, k2 = jax.random.split(key)
    params = model.init(
        {"params": k1, "dropout": k2},
        jnp.zeros((1, example_len), jnp.float32),
    )
    tx = build_d2v_optimizer(pcfg)
    state = D2vTrainState(
        params=params,
        ema_blocks=init_ema_blocks(params, cfg, pcfg),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    return model, tx, state


def make_d2v_loss_fn(model: D2vPretrainModel, train: bool = True):
    """The complete d2v objective (teacher targets, masked student,
    decoder, frame + utterance losses, collapse telemetry) as a pure
    function of (params, ema_blocks, wav, wav_pad, key). ``train=False``
    disables the dropouts (fairseq ``model.eval()`` validation
    semantics; masking still draws from ``key``, so a fixed key gives a
    stable comparable validation metric)."""
    pcfg = model.pcfg

    def loss_fn(params, ema_blocks, wav, wav_pad, key):
        k_mask, k_drop, k_tok, k_din, k_dtok, k_chan = jax.random.split(key, 6)

        x_local, frame_mask = model.apply(
            params, wav, wav_pad, method=D2vPretrainModel.local_features
        )
        b, t, d = x_local.shape
        fm = (
            frame_mask
            if frame_mask is not None
            else jnp.zeros((b, t), bool)
        )

        # --- teacher: unmasked pass, EMA'd main blocks, no grad ---
        t_params = merge_teacher_params(params, ema_blocks)
        if pcfg.ema_encoder_only:
            xt_local = x_local  # teacher shares the student's feature
            # extractor under stop_gradient (config.py:66-71 semantics)
        else:
            # whole-model EMA: the teacher re-extracts its own features
            # with the EMA'd local encoder/proj
            xt_local, _ = model.apply(
                t_params, wav, wav_pad, method=D2vPretrainModel.local_features
            )
        xt = xt_local + model.apply(
            t_params, xt_local, fm, method=D2vPretrainModel.positional
        )
        _, layer_ts = model.apply(
            t_params, xt, fm, True, method=D2vPretrainModel.contextualize
        )
        y = jax.lax.stop_gradient(make_targets(layer_ts, pcfg))

        # --- clone_batch: M different masks per clip ---
        m = max(1, pcfg.clone_batch)
        if m > 1:
            x_rep = jnp.repeat(x_local, m, axis=0)
            fm_rep = jnp.repeat(fm, m, axis=0)
            y_rep = jnp.repeat(y, m, axis=0)
        else:
            x_rep, fm_rep, y_rep = x_local, fm, y

        # --- mask + remove masked tokens ---
        if pcfg.mask_length == 1:
            # fairseq's MAE path (random_masking, base.py:486-519) does NOT
            # restrict to valid frames — keep that behavior
            mask, n_masked = sample_random_mask(k_mask, b * m, t, pcfg.mask_prob)
        else:
            # the span path DOES: compute_mask_indices receives padding_mask
            # (base.py:385), so spans land on valid frames
            mask, n_masked = sample_span_mask(
                k_mask, b * m, t, pcfg.mask_prob, pcfg.mask_length,
                pcfg.inverse_mask,
                lengths=(~fm_rep).sum(axis=1),
            )
        info = make_mask_info(mask, n_masked)
        x_masked = apply_mask(
            x_rep, info, pcfg.encoder_zero_mask, pcfg.mask_noise_std, k_tok
        )
        if pcfg.mask_channel_prob > 0:
            # base.py:456-469: span-mask embedding channels per clip and
            # zero them across all timesteps. Like the time mask, channel
            # zeros reach the student only through the POSITIONAL conv:
            # the kept-token values are gathered from the pre-mask
            # features (make_maskinfo's x_unmasked is built BEFORE
            # apply_mask, base.py:407-440)
            ch_mask, _ = sample_span_mask(
                k_chan, b * m, d, pcfg.mask_channel_prob,
                pcfg.mask_channel_length,
            )
            x_masked = x_masked * (
                1.0 - ch_mask[:, None, :].astype(x_masked.dtype)
            )
        x_pos = model.apply(
            params, x_masked, fm_rep, method=D2vPretrainModel.positional
        )
        # kept tokens come from the UNmasked features (x_unmasked is
        # gathered pre-apply_mask in the reference); identical to gathering
        # from x_masked for pure time masking (kept positions untouched),
        # required for channel-mask parity
        x_kept = gather_unmasked(x_rep, info) + gather_unmasked(x_pos, info)
        pm_kept = gather_unmasked_mask(fm_rep, info)
        x_enc, _ = model.apply(
            params, x_kept, pm_kept, not train,
            method=D2vPretrainModel.contextualize,
            **({"rngs": {"dropout": k_drop}} if train else {}),
        )

        # --- decoder input: dropout on encoder outputs only (base.py:158-160),
        # then mask-token restoration ---
        rate = pcfg.decoder.input_dropout
        if train and rate > 0:
            keep = jax.random.bernoulli(k_din, 1.0 - rate, x_enc.shape)
            x_enc = jnp.where(keep, x_enc / (1.0 - rate), 0.0).astype(x_enc.dtype)
        # independent stream from apply_mask's replacement noise (same-key
        # draws would correlate decoder mask tokens with encoder inputs)
        dec_in = restore_with_mask_tokens(x_enc, info, pcfg.mask_noise_std, k_dtok)
        pred = model.apply(params, dec_in, method=D2vPretrainModel.decode)

        # --- losses ---
        w_frame = (mask & ~fm_rep)
        loss_frame = d2v_loss(pred, y_rep, w_frame, pcfg.loss_beta, pcfg.loss_scale)
        valid = (~fm_rep).astype(jnp.float32)[..., None]
        nv = jnp.clip(valid.sum(axis=1), 1.0, None)
        pred_utt = (pred.astype(jnp.float32) * valid).sum(axis=1) / nv
        y_utt = (y_rep * valid).sum(axis=1) / nv
        loss_utt = d2v_loss(
            pred_utt, y_utt, jnp.ones(pred_utt.shape[0]), pcfg.loss_beta,
            pcfg.loss_scale,
        )
        total = pcfg.d2v_loss * loss_frame + pcfg.cls_loss * loss_utt
        metrics = {
            "loss": total,
            "d2v_loss": loss_frame,
            "cls_loss": loss_utt,
            # collapse telemetry on the masked-token population only, like
            # the reference (it extracts masked tokens before compute_var)
            "target_var": compute_var(y_rep, w_frame),
            "pred_var": compute_var(pred, w_frame),
            "masked_pct": w_frame.mean(),
        }
        return total, metrics

    return loss_fn


def make_d2v_eval_step(model: D2vPretrainModel):
    """jitted (params, ema_blocks, wav, pad, key) -> metrics with NO
    update — the fairseq validate() analogue over the same masked
    objective."""
    loss_fn = make_d2v_loss_fn(model, train=False)

    @jax.jit
    def eval_fn(params, ema_blocks, wav, wav_pad, key):
        _, metrics = loss_fn(params, ema_blocks, wav, wav_pad, key)
        return metrics

    return eval_fn


def make_d2v_train_step(model: D2vPretrainModel, tx, jit: bool = True):
    """jit=False returns the raw step body (used by the scan-chunk runner,
    which jits the whole chunk instead)."""
    pcfg = model.pcfg
    loss_fn = make_d2v_loss_fn(model, train=True)

    def step_fn(state: D2vTrainState, wav, wav_pad, key):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.ema_blocks, wav, wav_pad, key
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        decay = annealed_decay(pcfg, state.step)
        p = params["params"]
        # EMA arithmetic in f32 regardless of the STORAGE dtype
        # (pcfg.ema_dtype): for f32 storage the casts are no-ops and this is
        # bit-identical to the round-3 update
        ema = {
            k: jax.tree.map(
                lambda e, s: (
                    decay * e.astype(jnp.float32)
                    + (1.0 - decay) * s.astype(jnp.float32)
                ).astype(e.dtype),
                state.ema_blocks[k],
                p[k],
            )
            for k in state.ema_blocks
        }
        metrics["ema_decay"] = decay
        new_state = D2vTrainState(
            params=params,
            ema_blocks=ema,
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, metrics

    if jit:
        return jax.jit(step_fn, donate_argnums=(0,))
    return step_fn


@partial(jax.jit, static_argnums=(1,))
def split_chunk_keys(rng: jax.Array, k: int):
    """(rng', keys (k,)) via k ITERATED binary splits — bit-identical to the
    per-step driver's `rng, key = jax.random.split(rng)` sequence, in one
    device dispatch instead of k (per-dispatch latency dominates on
    remote-attached chips; PERFORMANCE.md d2v driver table)."""

    def body(r, _):
        r, kk = jax.random.split(r)
        return r, kk

    return jax.lax.scan(body, rng, None, length=k)


def make_d2v_chunk_runner(model: D2vPretrainModel, tx):
    """lax.scan of the train-step body over k stacked batches: ONE XLA
    dispatch advances k updates (the d2v analogue of the DAD trainer's
    --scan-chunk, dad/epoch_scan.py). Returns
    run(state, wavs (k,B,T), pads (k,B,T), keys (k,)) ->
    (state', metrics stacked (k,)); numerically identical to k calls of
    make_d2v_train_step with the same keys (tested)."""
    body_fn = make_d2v_train_step(model, tx, jit=False)

    @partial(jax.jit, donate_argnums=(0,))
    def run(state: D2vTrainState, wavs, pads, keys):
        def body(s, xs):
            w, p, k = xs
            return body_fn(s, w, p, k)

        return jax.lax.scan(body, state, (wavs, pads, keys))

    return run
