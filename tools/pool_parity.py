#!/usr/bin/env python3
"""Pooled cross-corpus parity verdict.

Each per-corpus protocol (tools/run_parity.py) gates mean noisy-domain UA/WA
at +/-0.5 pp, but per-seed sigma is ~1-2 pp (the synthetic classes overlap
by design), so a single-corpus run has SE ~0.5 pp — the gate flickers with
the RNG even when there is no systematic difference. This tool pools the
per-seed deltas from all available reports into one inverse-variance-
weighted estimate: ~3x the evidence against the same +/-0.5 pp bound, plus
a t-statistic so noise and systematic gaps are distinguishable.

Usage: python tools/pool_parity.py [--tolerance 0.5]
Reads PARITY_REPORT.json / PARITY_REPORT_casia.json / PARITY_REPORT_emodb.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPORTS = {
    "iemocap": "PARITY_REPORT.json",
    "casia": "PARITY_REPORT_casia.json",
    "emodb": "PARITY_REPORT_emodb.json",
}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tolerance", type=float, default=0.5)
    ap.add_argument("--metric", default="noisy_UA")
    ap.add_argument("--out", default="PARITY_POOLED.json")
    args = ap.parse_args(argv)

    rows = []
    for corpus, path in REPORTS.items():
        if not os.path.exists(path):
            continue
        d = json.load(open(path))
        m = d["metrics"][args.metric]
        deltas = np.asarray(m["jax_per_seed"]) - np.asarray(m["torch_per_seed"])
        if len(deltas) < 2:
            # std(ddof=1) of one sample is NaN and would poison the pooled
            # inverse-variance weights for every corpus
            print(f"skipping {corpus}: only {len(deltas)} seed(s)")
            continue
        rows.append((corpus, deltas))
    if not rows:
        print("no parity reports found")
        return 1

    # pooled mean of per-seed paired deltas, weighted by inverse variance
    means = np.asarray([d.mean() for _c, d in rows])
    ses = np.asarray([d.std(ddof=1) / np.sqrt(len(d)) for _c, d in rows])
    w = 1.0 / np.maximum(ses**2, 1e-12)
    pooled = float((w * means).sum() / w.sum())
    pooled_se = float(np.sqrt(1.0 / w.sum()))
    n_pairs = int(sum(len(d) for _c, d in rows))
    ok = abs(pooled) <= args.tolerance

    report = {
        "metric": args.metric,
        "per_corpus": {
            c: {"delta_pp": float(d.mean()),
                "se_pp": float(d.std(ddof=1) / np.sqrt(len(d))),
                "n_seeds": len(d)}
            for c, d in rows
        },
        "pooled_delta_pp": pooled,
        "pooled_se_pp": pooled_se,
        "pooled_t": pooled / pooled_se if pooled_se > 0 else 0.0,
        "n_paired_runs": n_pairs,
        "tolerance_pp": args.tolerance,
        "within_tolerance": ok,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    for c, d in rows:
        print(f"{c:<9} delta {d.mean():+.2f} ± {d.std(ddof=1)/np.sqrt(len(d)):.2f} pp  (n={len(d)})")
    print(
        f"pooled   delta {pooled:+.2f} ± {pooled_se:.2f} pp over {n_pairs} "
        f"paired runs -> {'WITHIN' if ok else 'OUTSIDE'} ±{args.tolerance} pp"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
