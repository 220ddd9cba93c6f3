"""Corpus distribution analysis (reference analyze_iemocap_distribution.py).

Class / group (session or speaker) histograms and sequence-length statistics
of a feature store.
"""

from __future__ import annotations

import os
from collections import Counter
from typing import Dict, Optional, Sequence

import numpy as np

from ..data.store import FeatureStore
from ..utils import dump_json
from .common import get_pyplot, savefig


def analyze_distribution(
    store: FeatureStore,
    class_names: Sequence[str],
    out_dir: Optional[str] = None,
) -> Dict:
    labels = store.labels if store.labels is not None else np.array([])
    class_counts = {
        class_names[c]: int(np.sum(labels == c)) for c in range(len(class_names))
    }
    group_counts = (
        {str(g): int(n) for g, n in Counter(store.groups.tolist()).items()}
        if store.groups is not None
        else {}
    )
    lengths = store.sizes
    summary = {
        "num_clips": int(store.num),
        "feature_dim": int(store.dim),
        "class_counts": class_counts,
        "group_counts": group_counts,
        "length_stats": {
            "min": int(lengths.min()) if len(lengths) else 0,
            "max": int(lengths.max()) if len(lengths) else 0,
            "mean": float(lengths.mean()) if len(lengths) else 0.0,
            "p50": float(np.percentile(lengths, 50)) if len(lengths) else 0.0,
            "p95": float(np.percentile(lengths, 95)) if len(lengths) else 0.0,
        },
    }

    plt = get_pyplot()
    if plt and out_dir:
        fig, axes = plt.subplots(1, 3, figsize=(16, 4))
        axes[0].bar(class_counts.keys(), class_counts.values())
        axes[0].set_title("class distribution")
        if group_counts:
            axes[1].bar(group_counts.keys(), group_counts.values())
            axes[1].set_title("group distribution")
            axes[1].tick_params(axis="x", rotation=45)
        axes[2].hist(lengths, bins=30)
        axes[2].set_title("frame-length distribution")
        savefig(fig, out_dir, "distribution.png")
        plt.close(fig)
    if out_dir:
        dump_json(summary, os.path.join(out_dir, "distribution_summary.json"))
    return summary
