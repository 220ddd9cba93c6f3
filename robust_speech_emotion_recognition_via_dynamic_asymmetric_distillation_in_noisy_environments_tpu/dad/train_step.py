"""The DAD train step: the reference's per-batch loop body
(train.py:397-496) as ONE jitted function over a state pytree.

Everything the torch version does across train_step + backward + clip +
Adam.step + EMA + DACP bookkeeping happens inside a single XLA computation:

  state = {student, teacher, opt_state, dacp}
  (state', metrics, tracking) = step(state, clean_batch, noisy_batch,
                                      scalars, rng)

Epoch-level scalars (warmup flag, consistency/ECDA weights, DACP quantile
level gamma_e, learning rate) are computed host-side per epoch and passed in,
so a single compiled executable serves the whole run.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..configs import DADConfig
from ..data.batching import Batch
from ..models.heads import DADHead, SSRLState, ema_update, init_ssrl
from .augment import strong_augment, weak_augment
from .dacp import DACPState, dacp_epoch_update, dacp_mask, fixed_threshold_mask, init_dacp
from .ecda import ecda_loss


class DADTrainState(NamedTuple):
    ssrl: SSRLState
    opt_state: Any
    dacp: DACPState


class StepScalars(NamedTuple):
    """Per-epoch host-computed scalars (update_loss_weights, train.py:380-395)."""

    warmup: jax.Array  # bool — epoch < WARMUP_EPOCHS
    w_consistency: jax.Array  # current consistency weight
    w_ecda: jax.Array  # current ECDA weight
    gamma_e: jax.Array  # DACP quantile level for this epoch

    @staticmethod
    def for_epoch(cfg: DADConfig, epoch: int) -> "StepScalars":
        warmup = epoch < cfg.warmup_epochs
        if warmup:
            w_cons, w_ecda = 0.0, 0.0
        else:
            if cfg.progressive_training:
                progress = min(
                    1.0, (epoch - cfg.warmup_epochs) / cfg.weight_ramp_epochs
                )
                w_cons = (
                    cfg.initial_consistency_weight
                    + (cfg.final_consistency_weight - cfg.initial_consistency_weight)
                    * progress
                )
            else:
                w_cons = cfg.weight_consistency
            if epoch >= cfg.ecda_start_epoch:
                ecda_progress = min(
                    1.0, (epoch - cfg.ecda_start_epoch) / cfg.weight_ramp_epochs
                )
                w_ecda = cfg.weight_ecda * ecda_progress
            else:
                w_ecda = 0.0
        gamma = cfg.dacp.quantile_start + (
            cfg.dacp.quantile_end - cfg.dacp.quantile_start
        ) * (epoch / cfg.epochs)
        return StepScalars(
            warmup=jnp.asarray(warmup),
            w_consistency=jnp.asarray(w_cons, jnp.float32),
            w_ecda=jnp.asarray(w_ecda, jnp.float32),
            gamma_e=jnp.asarray(gamma, jnp.float32),
        )


def cosine_lr(cfg: DADConfig, epoch: int) -> float:
    """torch CosineAnnealingLR(T_max=EPOCHS) stepped once per epoch
    (train.py:363, 519)."""
    if cfg.lr_scheduler != "cosine":
        return cfg.learning_rate
    import math

    return 0.5 * cfg.learning_rate * (1.0 + math.cos(math.pi * epoch / cfg.epochs))


def build_optimizer(cfg: DADConfig) -> optax.GradientTransformation:
    """torch Adam(lr, weight_decay) semantics: clip grads first, then L2
    decay added into the gradient, then Adam moments (train.py:359-370,
    485-489)."""
    def make(learning_rate):
        chain = []
        if cfg.gradient_clipping:
            chain.append(optax.clip_by_global_norm(cfg.max_grad_norm))
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        chain.append(optax.scale_by_learning_rate(learning_rate))
        return optax.chain(*chain)

    return optax.inject_hyperparams(make)(learning_rate=cfg.learning_rate)


def set_learning_rate(opt_state, lr: float):
    """Host-side per-epoch LR update into the injected hyperparams."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def init_dad_train_state(
    cfg: DADConfig, key: jax.Array
) -> Tuple[DADHead, optax.GradientTransformation, DADTrainState]:
    head, ssrl = init_ssrl(
        key, cfg.input_dim, cfg.hidden_dim, cfg.num_classes, cfg.dropout_rate
    )
    tx = build_optimizer(cfg)
    opt_state = tx.init(ssrl.student)
    return head, tx, DADTrainState(ssrl=ssrl, opt_state=opt_state, dacp=init_dacp(cfg.num_classes))


def smoothed_ce(
    logits: jax.Array, labels: jax.Array, row_valid: jax.Array, smoothing: float
) -> jax.Array:
    """torch CrossEntropyLoss(label_smoothing=eps) over valid rows."""
    C = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(jnp.clip(labels, 0, C - 1), C, dtype=logits.dtype)
    target = onehot * (1.0 - smoothing) + smoothing / C
    per_row = -jnp.sum(target * logp, axis=-1)
    w = row_valid.astype(logits.dtype)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)


def make_dad_train_step(head: DADHead, tx: optax.GradientTransformation, cfg: DADConfig):
    """Returns jitted step(state, clean_batch, noisy_batch, scalars, anchors,
    key) -> (state', metrics, tracking)."""

    smoothing = cfg.label_smoothing_factor if cfg.use_label_smoothing else 0.0

    def loss_fn(
        student_params,
        teacher_params,
        dacp_state: DACPState,
        clean: Batch,
        noisy: Batch,
        scalars: StepScalars,
        anchors: jax.Array,
        key: jax.Array,
    ):
        k_drop_c, k_weak, k_strong, k_drop_s = jax.random.split(key, 4)

        # --- supervised CE on clean (train.py:398-400) ---
        clean_logits, clean_emb = head.apply(
            student_params,
            clean.feats,
            clean.padding_mask,
            deterministic=False,
            rngs={"dropout": k_drop_c},
        )
        ce = smoothed_ce(clean_logits, clean.labels, clean.row_valid, smoothing)

        # --- weak/strong views of the same noisy batch (train.py:405-406) ---
        noisy_weak = weak_augment(k_weak, noisy.feats, cfg.augment)
        noisy_strong = strong_augment(
            k_strong, noisy.feats, cfg.augment, padding_mask=noisy.padding_mask
        )

        # teacher forward, no grad, no dropout (train.py:408-410)
        teacher_logits, _ = head.apply(
            jax.lax.stop_gradient(teacher_params),
            noisy_weak,
            noisy.padding_mask,
            deterministic=True,
        )
        teacher_probs = jax.nn.softmax(teacher_logits, axis=-1)

        # --- DACP / fixed-threshold gating (train.py:412-420) ---
        if cfg.dacp.use_dacp:
            new_dacp, mask, scores, wce = dacp_mask(
                dacp_state,
                teacher_probs,
                noisy.row_valid,
                scalars.gamma_e,
                anchors,
                cfg.dacp,
            )
        else:
            mask, scores, wce = fixed_threshold_mask(
                teacher_probs, noisy.row_valid, cfg.dacp.fixed_confidence_threshold
            )
            new_dacp = dacp_state

        mask_f = mask.astype(jnp.float32)
        count = jnp.sum(mask_f)
        preds = jnp.argmax(teacher_probs, axis=-1)

        # --- student on the strong view (train.py:439-440) ---
        student_logits, strong_emb = head.apply(
            student_params,
            noisy_strong,
            noisy.padding_mask,
            deterministic=False,
            rngs={"dropout": k_drop_s},
        )
        student_logp = jax.nn.log_softmax(student_logits, axis=-1)

        # masked-mean KL consistency (train.py:444-447)
        kl_per = jnp.sum(
            teacher_probs * (jnp.log(teacher_probs + 1e-12) - student_logp), axis=-1
        )
        consistency = jnp.sum(kl_per * mask_f) / (count + 1e-8)
        consistency = jnp.where(count > 1, consistency, 0.0)

        # ECDA (train.py:450-460)
        if cfg.ecda.use_ecda:
            ecda = ecda_loss(
                clean_emb,
                strong_emb,
                clean.labels,
                preds,
                mask,
                scores,
                wce,
                clean.row_valid,
                noisy.row_valid,
                cfg.ecda,
            )
            ecda = jnp.where((count > 1) & (scalars.w_ecda > 0), ecda, 0.0)
        else:
            ecda = jnp.asarray(0.0, jnp.float32)

        # warmup: only CE contributes and no DACP state movement
        consistency = jnp.where(scalars.warmup, 0.0, consistency)
        ecda = jnp.where(scalars.warmup, 0.0, ecda)
        new_dacp = jax.tree.map(
            lambda new, old: jnp.where(scalars.warmup, old, new),
            new_dacp,
            dacp_state,
        )

        total = ce + scalars.w_consistency * consistency + scalars.w_ecda * ecda
        aux = {
            "dacp": new_dacp,
            "metrics": {
                "total_loss": total,
                "supervised_ce_loss": ce,
                "consistency_loss": consistency,
                "ecda_loss": ecda,
                "high_confidence_count": count,
            },
            "tracking": {
                "ids": noisy.ids,
                "pseudo_label": preds,
                "certainty_score": scores,
                "is_masked_in": mask,
            },
        }
        return total, aux

    def step(
        state: DADTrainState,
        clean: Batch,
        noisy: Batch,
        scalars: StepScalars,
        anchors: jax.Array,
        key: jax.Array,
    ):
        grads, aux = jax.grad(loss_fn, has_aux=True)(
            state.ssrl.student,
            state.ssrl.teacher,
            state.dacp,
            clean,
            noisy,
            scalars,
            anchors,
            key,
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.ssrl.student)
        new_student = optax.apply_updates(state.ssrl.student, updates)
        ssrl = SSRLState(student=new_student, teacher=state.ssrl.teacher)

        # teacher EMA after the optimizer step, post-warmup only
        # (train.py:491-492)
        ssrl_ema = ema_update(ssrl, cfg.ema_momentum)
        new_teacher = jax.tree.map(
            lambda cold, hot: jnp.where(scalars.warmup, cold, hot),
            ssrl.teacher,
            ssrl_ema.teacher,
        )

        new_state = DADTrainState(
            ssrl=SSRLState(student=new_student, teacher=new_teacher),
            opt_state=new_opt,
            dacp=aux["dacp"],
        )
        return new_state, aux["metrics"], aux["tracking"]

    return jax.jit(step, donate_argnums=(0,))


def epoch_end_dacp(state: DADTrainState, cfg: DADConfig) -> DADTrainState:
    """Epoch-boundary DACP quality update (train.py:498-499)."""
    return state._replace(dacp=dacp_epoch_update(state.dacp, cfg.dacp))


def make_eval_step(head: DADHead):
    """Jitted eval forward: returns (preds, logits) for a batch using either
    student or teacher params (model.predict, model.py:225-245)."""

    def fwd(params, feats, padding_mask):
        logits, _ = head.apply(params, feats, padding_mask, deterministic=True)
        return jnp.argmax(logits, axis=-1), logits

    return jax.jit(fwd)
