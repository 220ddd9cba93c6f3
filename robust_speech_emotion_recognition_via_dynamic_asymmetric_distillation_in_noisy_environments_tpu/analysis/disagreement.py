"""Teacher-student disagreement analysis (reference analyze_disagreement.py).

Consumes training_history.json: disagreement_rate_noisy trajectory with
DACP threshold / quality overlays; reports summary statistics and a trend.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from ..utils import dump_json
from .common import get_pyplot, load_history, savefig


def analyze_disagreement(results_dir: str, out_dir: Optional[str] = None) -> Dict:
    hist = load_history(results_dir)
    out_dir = out_dir or os.path.join(results_dir, "analysis")
    rates = np.asarray(hist.get("disagreement_rate_noisy", []), dtype=float)

    summary: Dict = {"num_points": int(len(rates))}
    if len(rates):
        x = np.arange(len(rates))
        slope = float(np.polyfit(x, rates, 1)[0]) if len(rates) > 1 else 0.0
        summary.update(
            mean_disagreement=float(rates.mean()),
            final_disagreement=float(rates[-1]),
            max_disagreement=float(rates.max()),
            trend_slope_per_epoch=slope,
            converging=bool(slope < 0),
        )

    plt = get_pyplot()
    if plt and len(rates):
        fig, ax1 = plt.subplots(figsize=(9, 5))
        ax1.plot(rates, label="teacher-student disagreement", color="tab:red")
        ax1.set_xlabel("validation step")
        ax1.set_ylabel("disagreement rate")
        ax1.grid(True, alpha=0.3)
        thr = hist.get("dacp_ema_thresholds")
        if thr:
            ax2 = ax1.twinx()
            thr = np.asarray(thr, dtype=float)
            for c in range(thr.shape[1]):
                ax2.plot(thr[:, c], alpha=0.4, linestyle="--", label=f"tau_{c}")
            ax2.set_ylabel("DACP threshold")
        fig.legend(loc="upper right", fontsize=8)
        savefig(fig, out_dir, "disagreement.png")
        plt.close(fig)

    dump_json(summary, os.path.join(out_dir, "disagreement_summary.json"))
    return summary


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--results-dir", required=True)
    p.add_argument("--out-dir", default=None)
    a = p.parse_args(argv)
    print(analyze_disagreement(a.results_dir, a.out_dir))


if __name__ == "__main__":
    main()
