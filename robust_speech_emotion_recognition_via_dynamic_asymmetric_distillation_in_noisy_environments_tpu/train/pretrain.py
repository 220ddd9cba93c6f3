"""Supervised pretrain stage: speaker-isolated K-fold CV with early stopping.

TPU-native counterpart of train_with_early_stopping (reference
train_for_clean.py:62-391): a single jitted CE train step over static-shape
batches, host-side schedulers/early stopping, the same best-checkpoint-per-
fold artifacts (exported in the torch ``pre_net``/``post_net`` layout the DAD
stage consumes) and the same summary/report JSONs.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs import PretrainConfig
from ..data.batching import Batch, PaddedBatchIterator
from ..data.prefetch import prefetch
from ..data.folds import corpus_fold_split
from ..data.store import FeatureStore, load_feature_store
from ..eval.metrics import (
    accuracy,
    balanced_accuracy,
    classification_report_text,
    f1_scores,
)
from ..models.convert import flax_pretrain_head_to_torch, save_torch_file
from ..models.heads import PretrainHead
from ..utils import dump_json, get_logger
from .early_stopping import EarlyStopper
from .schedules import make_lr_scheduler

logger = get_logger(__name__)


def build_pretrain_optimizer(cfg: PretrainConfig):
    def make(learning_rate):
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(learning_rate),
        )

    return optax.inject_hyperparams(make)(learning_rate=cfg.learning_rate)


def make_pretrain_steps(head: PretrainHead, tx):
    def loss_fn(params, batch: Batch):
        logits = head.apply(params, batch.feats, batch.padding_mask)
        logp = jax.nn.log_softmax(logits, axis=-1)
        C = logits.shape[-1]
        onehot = jax.nn.one_hot(jnp.clip(batch.labels, 0, C - 1), C)
        per_row = -jnp.sum(onehot * logp, axis=-1)
        w = batch.row_valid.astype(jnp.float32)
        loss = jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)
        preds = jnp.argmax(logits, axis=-1)
        correct = jnp.sum((preds == batch.labels) & batch.row_valid)
        return loss, (preds, correct)

    @jax.jit
    def train_step(params, opt_state, batch: Batch):
        (loss, (_preds, correct)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, correct

    @jax.jit
    def eval_step(params, batch: Batch):
        loss, (preds, _correct) = loss_fn(params, batch)
        return loss, preds

    return train_step, eval_step


def _run_eval(eval_step, params, it: PaddedBatchIterator):
    losses, y_true, y_pred = [], [], []
    for batch in it:
        loss, preds = eval_step(params, batch)
        losses.append(float(loss))
        preds = np.asarray(preds)
        for i in range(len(preds)):
            if batch.row_valid[i]:
                y_true.append(int(batch.labels[i]))
                y_pred.append(int(preds[i]))
    return float(np.mean(losses)) if losses else 0.0, np.array(y_true), np.array(y_pred)


def pretrain_fold(
    cfg: PretrainConfig,
    store: FeatureStore,
    fold: int,
    seed: Optional[int] = None,
) -> Dict:
    """Trains one fold; returns {params, history, test metrics}. ``fold`` is
    0-based everywhere in this framework."""
    seed = cfg.random_seed if seed is None else seed
    num_classes = cfg.num_classes

    tr_idx, va_idx, te_idx = corpus_fold_split(cfg.corpus, fold, store.groups)
    splits = {
        "train": store.subset(tr_idx),
        "val": store.subset(va_idx),
        "test": store.subset(te_idx),
    }
    its = {
        name: PaddedBatchIterator(
            s,
            cfg.batch_size,
            cfg.length_buckets,
            shuffle=(name == "train"),
            seed=seed,
        )
        for name, s in splits.items()
    }

    head = PretrainHead(cfg.input_dim, cfg.hidden_dim, num_classes)
    params = head.init(
        jax.random.PRNGKey(seed + fold),
        jnp.zeros((1, 4, cfg.input_dim), jnp.float32),
        jnp.zeros((1, 4), bool),
    )
    tx = build_pretrain_optimizer(cfg)
    opt_state = tx.init(params)
    train_step, eval_step = make_pretrain_steps(head, tx)

    scheduler = make_lr_scheduler(cfg)
    stopper = EarlyStopper(
        cfg.early_stopping_patience,
        cfg.early_stopping_min_delta,
        cfg.early_stopping_mode,
    )
    history = {
        "train_loss": [],
        "train_acc": [],
        "val_loss": [],
        "val_acc": [],
        "val_weighted_acc": [],
        "val_f1": [],
        "epochs": [],
        "lr": [],
    }
    best_metric = float("-inf") if cfg.early_stopping_mode == "max" else float("inf")
    best_params = params
    best_epoch = 0
    metric_key = cfg.early_stopping_metric

    for epoch in range(cfg.max_epochs):
        t0 = time.time()
        its["train"].set_epoch(epoch)
        total_loss, total_correct, total = 0.0, 0, 0
        n_batches = 0
        # worker-thread batch assembly overlaps device steps (the reference's
        # DataLoader(num_workers=4), data.py:258-263)
        for batch in prefetch(its["train"], depth=2):
            params, opt_state, loss, correct = train_step(params, opt_state, batch)
            total_loss += float(loss)
            total_correct += int(correct)
            total += int(batch.row_valid.sum())
            n_batches += 1
        train_loss = total_loss / max(n_batches, 1)
        train_acc = total_correct / max(total, 1)

        val_loss, y_true, y_pred = _run_eval(eval_step, params, its["val"])
        val_acc = accuracy(y_true, y_pred)
        val_wacc = balanced_accuracy(y_true, y_pred, num_classes)
        val_f1 = f1_scores(y_true, y_pred, num_classes)["macro"]

        scheduler_step_per_epoch = cfg.lr_scheduler_type in (
            "CosineAnnealingWarmRestarts",
            "StepLR",
        )
        lr = scheduler.step(epoch + 1, None if scheduler_step_per_epoch else val_loss)
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)

        for key, value in zip(
            ["train_loss", "train_acc", "val_loss", "val_acc", "val_weighted_acc",
             "val_f1", "epochs", "lr"],
            [train_loss, train_acc, val_loss, val_acc, val_wacc, val_f1,
             epoch + 1, lr],
        ):
            history[key].append(value)

        current = {
            "val_loss": val_loss,
            "val_acc": val_acc,
            "val_weighted_acc": val_wacc,
            "val_f1": val_f1,
        }[metric_key]
        better = (
            current > best_metric if cfg.early_stopping_mode == "max" else current < best_metric
        )
        if better:
            best_metric = current
            best_epoch = epoch + 1
            best_params = jax.tree.map(np.asarray, params)

        logger.info(
            "fold %d epoch %3d/%d train_loss %.4f train_acc %.4f %s %.4f "
            "(best %.4f @%d) lr %.2e %.1fs",
            fold + 1, epoch + 1, cfg.max_epochs, train_loss, train_acc,
            metric_key, current, best_metric, best_epoch, lr, time.time() - t0,
        )
        if stopper(current, epoch + 1):
            logger.info("early stopping at epoch %d", epoch + 1)
            break

    # test with best params
    _loss, y_true, y_pred = _run_eval(eval_step, best_params, its["test"])
    test_acc = accuracy(y_true, y_pred)
    test_wacc = balanced_accuracy(y_true, y_pred, num_classes)
    test_f1 = f1_scores(y_true, y_pred, num_classes)["macro"]

    return {
        "params": best_params,
        "best_epoch": best_epoch,
        "history": history,
        "test": {
            "y_true": y_true,
            "y_pred": y_pred,
            "accuracy": test_acc,
            "weighted_accuracy": test_wacc,
            "f1_macro": test_f1,
        },
    }


def train_with_early_stopping(
    cfg: PretrainConfig,
    store: Optional[FeatureStore] = None,
    folds: Optional[Tuple[int, ...]] = None,
) -> Dict:
    """Full K-fold CV driver (train_for_clean.py:62-391): per-fold training,
    best-checkpoint export (torch-layout .ckpt + flax .msgpack), reports and
    the aggregate summary JSONs."""
    if store is None:
        store = load_feature_store(cfg.feat_path, cfg.label_map)
    if not store.validate():
        # hard gate (validate_emotion2vec_data analogue) — an assert would
        # vanish under python -O
        raise ValueError("feature store failed integrity validation")
    if store.dim != cfg.input_dim:
        from dataclasses import replace

        logger.info("adjusting input_dim %d -> %d (from feature store)",
                    cfg.input_dim, store.dim)
        cfg = replace(cfg, input_dim=store.dim)

    folds = tuple(folds) if folds is not None else tuple(range(cfg.n_folds))
    save_dir = cfg.save_dir
    os.makedirs(save_dir, exist_ok=True)

    fold_results, fold_weighted, fold_f1 = [], [], []
    all_true, all_pred = [], []
    training_history = {}

    for fold in folds:
        logger.info("=" * 30 + f" FOLD {fold + 1}/{cfg.n_folds} " + "=" * 30)
        out = pretrain_fold(cfg, store, fold)
        training_history[f"fold_{fold + 1}"] = out["history"]

        # torch-layout checkpoint consumed by the DAD stage
        ckpt_path = os.path.join(save_dir, f"best_model_fold_{fold + 1}.ckpt")
        save_torch_file(flax_pretrain_head_to_torch(out["params"]), ckpt_path)

        test = out["test"]
        fold_results.append(test["accuracy"])
        fold_weighted.append(test["weighted_accuracy"])
        fold_f1.append(test["f1_macro"])
        all_true.extend(test["y_true"].tolist())
        all_pred.extend(test["y_pred"].tolist())

        report = classification_report_text(
            test["y_true"], test["y_pred"], cfg.class_names
        )
        with open(
            os.path.join(save_dir, f"test_classification_report_fold_{fold + 1}.txt"),
            "w",
        ) as f:
            f.write(f"Fold {fold + 1} Test Results:\n")
            f.write(f"Test Accuracy: {test['accuracy']:.4f}\n")
            f.write(f"Test Weighted Accuracy: {test['weighted_accuracy']:.4f}\n")
            f.write(f"Test Macro F1-score: {test['f1_macro']:.4f}\n\n")
            f.write("Test Classification Report:\n")
            f.write(report)
        logger.info(
            "fold %d test acc %.4f w-acc %.4f f1 %.4f",
            fold + 1, test["accuracy"], test["weighted_accuracy"], test["f1_macro"],
        )

    summary = {
        "mean_test_accuracy": float(np.mean(fold_results)),
        "std_test_accuracy": float(np.std(fold_results)),
        "mean_test_weighted_accuracy": float(np.mean(fold_weighted)),
        "std_test_weighted_accuracy": float(np.std(fold_weighted)),
        "mean_test_f1": float(np.mean(fold_f1)),
        "std_test_f1": float(np.std(fold_f1)),
        "fold_test_accuracies": fold_results,
        "fold_test_weighted_accuracies": fold_weighted,
        "fold_test_f1_scores": fold_f1,
        # report ACTUAL 1-based fold numbers (matching the checkpoint
        # names), not positions in a possibly-subset folds list
        "best_fold_accuracy": folds[int(np.argmax(fold_results))] + 1,
        "best_test_accuracy": float(np.max(fold_results)),
        "worst_fold_accuracy": folds[int(np.argmin(fold_results))] + 1,
        "worst_test_accuracy": float(np.min(fold_results)),
    }
    dump_json(summary, os.path.join(save_dir, "test_results.json"))
    dump_json(training_history, os.path.join(save_dir, "training_history.json"))
    plot_training_history(training_history, save_dir, cfg.corpus)
    return summary


def plot_training_history(training_history, save_dir, dataset_name="iemocap"):
    """Per-fold loss/accuracy curves (train_for_clean.py:475-513)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # pragma: no cover
        return
    for fold_key, history in training_history.items():
        epochs = history["epochs"]
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(14, 5))
        ax1.plot(epochs, history["train_loss"], marker="o", label="Train Loss")
        ax1.plot(epochs, history["val_loss"], marker="o", label="Validation Loss")
        ax1.set_xlabel("Epochs")
        ax1.set_ylabel("Loss")
        ax1.legend()
        ax1.grid(True)
        ax2.plot(epochs, history["train_acc"], marker="o", label="Train Accuracy")
        ax2.plot(epochs, history["val_acc"], marker="o", label="Validation Accuracy")
        ax2.set_xlabel("Epochs")
        ax2.set_ylabel("Accuracy")
        ax2.legend()
        ax2.grid(True)
        fig.suptitle(f"{dataset_name.upper()} Training History - {fold_key}")
        fig.savefig(
            os.path.join(save_dir, f"training_history_{fold_key}.png"),
            dpi=150,
            bbox_inches="tight",
        )
        plt.close(fig)
