"""Confirmation-bias analysis (reference analyze_confirmation_bias.py).

Consumes confirmation_bias_log.json — per-epoch (pseudo_label,
certainty_score, is_masked_in) for the tracked noisy samples — and reports
label-flip statistics, per-sample certainty drift, and mask-in rates.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, Optional

import numpy as np

from ..utils import dump_json
from .common import get_pyplot, load_bias_log, savefig


def analyze_confirmation_bias(results_dir: str, out_dir: Optional[str] = None) -> Dict:
    log = load_bias_log(results_dir)
    out_dir = out_dir or os.path.join(results_dir, "analysis")

    by_sample = defaultdict(list)
    for entry in log:
        by_sample[entry["sample_id"]].append(entry)

    flips, mask_rates, certainty_drift = [], [], []
    locked_in = 0
    for sid, entries in by_sample.items():
        entries.sort(key=lambda e: e["epoch"])
        labels = [e["pseudo_label"] for e in entries]
        n_flips = sum(a != b for a, b in zip(labels, labels[1:]))
        flips.append(n_flips)
        mask_rates.append(np.mean([e["is_masked_in"] for e in entries]))
        scores = [e["certainty_score"] for e in entries]
        certainty_drift.append(scores[-1] - scores[0])
        # "locked in": never flips after first epoch but always masked in —
        # the confirmation-bias signature
        if n_flips == 0 and np.mean([e["is_masked_in"] for e in entries]) > 0.9:
            locked_in += 1

    summary = {
        "num_tracked_samples": len(by_sample),
        "mean_label_flips": float(np.mean(flips)) if flips else 0.0,
        "never_flipped_fraction": float(np.mean([f == 0 for f in flips])) if flips else 0.0,
        "mean_mask_in_rate": float(np.mean(mask_rates)) if mask_rates else 0.0,
        "mean_certainty_drift": float(np.mean(certainty_drift)) if certainty_drift else 0.0,
        "locked_in_count": locked_in,
    }

    plt = get_pyplot()
    if plt and flips:
        fig, axes = plt.subplots(1, 3, figsize=(15, 4))
        axes[0].hist(flips, bins=max(max(flips), 1))
        axes[0].set_title("pseudo-label flips per sample")
        axes[1].hist(mask_rates, bins=10)
        axes[1].set_title("mask-in rate per sample")
        axes[2].hist(certainty_drift, bins=10)
        axes[2].set_title("certainty drift (last - first)")
        savefig(fig, out_dir, "confirmation_bias.png")
        plt.close(fig)

    dump_json(summary, os.path.join(out_dir, "confirmation_bias_summary.json"))
    return summary


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--results-dir", required=True)
    p.add_argument("--out-dir", default=None)
    a = p.parse_args(argv)
    print(analyze_confirmation_bias(a.results_dir, a.out_dir))


if __name__ == "__main__":
    main()
