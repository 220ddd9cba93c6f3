"""One-shot anchor calibration (reference train.py:317-357).

Runs the freshly-initialized student over the clean TRAIN loader and the
noisy VAL loader (a reference quirk, preserved: _run_anchor_calibration uses
the noisy validation split, train.py:325), collects per-true-class certainty
statistics, and produces the anchor floors:

    anchor_c = clamp(mu_clean_c - k * sigma_clean_c, min=0)
               * (mu_noisy_c / (mu_clean_c + 1e-8))

Statistics use numpy ddof=0 like np.std in the reference; classes with no
samples get mean/std 0 (train.py:345-349).
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import DADConfig
from ..data.batching import Batch
from ..models.heads import DADHead
from .dacp import certainty_scores


def run_anchor_calibration(
    head: DADHead,
    student_params,
    clean_batches: Iterable[Batch],
    noisy_batches: Iterable[Batch],
    cfg: DADConfig,
) -> np.ndarray:
    C = cfg.num_classes

    @jax.jit
    def scores_of(feats, padding_mask):
        logits, _ = head.apply(student_params, feats, padding_mask, deterministic=True)
        probs = jax.nn.softmax(logits, axis=-1)
        s, _ = certainty_scores(probs, cfg.dacp.use_entropy_in_score)
        return s

    def collect(batches):
        per_class = [[] for _ in range(C)]
        for b in batches:
            s = np.asarray(scores_of(jnp.asarray(b.feats), jnp.asarray(b.padding_mask)))
            for i in range(len(s)):
                if b.row_valid[i] and b.labels[i] >= 0:
                    per_class[int(b.labels[i])].append(float(s[i]))
        return per_class

    clean_scores = collect(clean_batches)
    noisy_scores = collect(noisy_batches)

    mu_clean = np.array([np.mean(s) if s else 0.0 for s in clean_scores])
    sigma_clean = np.array([np.std(s) if s else 0.0 for s in clean_scores])
    mu_noisy = np.array([np.mean(s) if s else 0.0 for s in noisy_scores])

    shift_ratio = mu_noisy / (mu_clean + 1e-8)
    base = np.clip(mu_clean - cfg.dacp.anchor_std_k * sigma_clean, 0.0, None)
    return (base * shift_ratio).astype(np.float32)
