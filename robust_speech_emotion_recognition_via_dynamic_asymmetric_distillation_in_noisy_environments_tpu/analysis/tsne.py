"""Embedding-space t-SNE comparison (reference iemocap_plot_tsne.py).

Embeds noisy test features through (a) a pretrain head and (b) a DAD student
encoder, runs t-SNE, and reports silhouette / Calinski-Harabasz scores plus a
side-by-side scatter.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import DADConfig
from ..data.batching import PaddedBatchIterator
from ..data.store import FeatureStore
from ..models.heads import DADHead
from ..utils import dump_json
from .common import get_pyplot, savefig


def _embed_all(head: DADHead, params, it: PaddedBatchIterator):
    # params are a jit ARGUMENT committed to the device once — closing over
    # a host tree would re-upload it per compiled bucket over the tunnel
    # (CLAUDE.md device rule; eval/inference.py does the same)
    params = jax.device_put(params)

    @jax.jit
    def emb(p, feats, mask):
        _logits, e = head.apply(p, feats, mask, deterministic=True)
        return e

    X, y = [], []
    for b in it:
        e = np.asarray(emb(params, jnp.asarray(b.feats),
                           jnp.asarray(b.padding_mask)))
        for i in range(len(e)):
            if b.row_valid[i] and b.labels[i] >= 0:
                X.append(e[i])
                y.append(int(b.labels[i]))
    return np.stack(X) if X else np.zeros((0, 1)), np.asarray(y)


def analyze_tsne(
    cfg: DADConfig,
    store: FeatureStore,
    param_sets: Dict[str, dict],  # {"pretrain": ssrl-style params, "dad": ...}
    out_dir: str,
    perplexity: float = 30.0,
    seed: int = 42,
) -> Dict:
    from sklearn.manifold import TSNE
    from sklearn.metrics import calinski_harabasz_score, silhouette_score

    head = DADHead(cfg.input_dim, cfg.hidden_dim, cfg.num_classes, cfg.dropout_rate)
    it = PaddedBatchIterator(store, cfg.batch_size, cfg.length_buckets)

    summary: Dict = {}
    embeds = {}
    for name, params in param_sets.items():
        X, y = _embed_all(head, params, it)
        if len(X) < 5:
            continue
        perp = min(perplexity, max(2, len(X) // 4))
        Z = TSNE(
            n_components=2, perplexity=perp, random_state=seed, init="pca"
        ).fit_transform(X)
        embeds[name] = (Z, y)
        summary[name] = {
            "silhouette": float(silhouette_score(X, y)) if len(set(y)) > 1 else None,
            "calinski_harabasz": float(calinski_harabasz_score(X, y))
            if len(set(y)) > 1
            else None,
            "num_samples": int(len(X)),
        }

    plt = get_pyplot()
    if plt and embeds:
        fig, axes = plt.subplots(1, len(embeds), figsize=(6 * len(embeds), 5))
        if len(embeds) == 1:
            axes = [axes]
        for ax, (name, (Z, y)) in zip(axes, embeds.items()):
            for c in range(cfg.num_classes):
                sel = y == c
                ax.scatter(Z[sel, 0], Z[sel, 1], s=8, alpha=0.6,
                           label=cfg.class_names[c])
            ax.set_title(f"{name} (sil={summary[name]['silhouette']:.3f})"
                         if summary[name]["silhouette"] is not None else name)
            ax.legend(fontsize=8)
        savefig(fig, out_dir, "tsne.png")
        plt.close(fig)

    dump_json(summary, os.path.join(out_dir, "tsne_summary.json"))
    return summary
