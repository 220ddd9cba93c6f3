#!/usr/bin/env python3
"""North-star parity checker: compares this framework's fold results against
a reference PyTorch run on the same corpus/noise condition.

Both sides emit the same ``BEST_detailed_results_epoch_*.json`` schema (the
reference natively, this framework via eval/reports.py), so parity is a JSON
diff: UA (weighted accuracy) and WA/W-F1 within +/- 0.5 percentage points on
the noisy domain (BASELINE.md operative target).

Usage:
    python tools/parity_check.py \
        --ours   <results_dir>/fold_1 \
        --theirs <reference_results_dir>/fold_1 \
        [--tolerance 0.5]

Exit code 0 = within tolerance, 1 = out of tolerance, 2 = missing reports.
"""

import argparse
import glob
import json
import os
import sys


def newest_best(results_dir):
    files = sorted(
        glob.glob(os.path.join(results_dir, "reports", "BEST_detailed_results_epoch_*.json")),
        key=os.path.getmtime,
    )
    return files[-1] if files else None


def pct(s):
    return float(str(s).rstrip("%"))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ours", required=True)
    p.add_argument("--theirs", required=True)
    p.add_argument("--tolerance", type=float, default=0.5)
    args = p.parse_args(argv)

    paths = {}
    for name, d in (("ours", args.ours), ("theirs", args.theirs)):
        f = newest_best(d)
        if f is None:
            print(f"missing BEST_detailed_results under {d}", file=sys.stderr)
            return 2
        paths[name] = json.load(open(f, encoding="utf-8"))

    rows = []
    worst = 0.0
    for domain in ("noisy", "clean"):
        for metric in ("w_acc", "w_f1", "acc"):
            a = pct(paths["ours"]["summary"][domain][metric])
            b = pct(paths["theirs"]["summary"][domain][metric])
            delta = a - b
            worst = max(worst, abs(delta) if domain == "noisy" else 0.0)
            rows.append((domain, metric, a, b, delta))

    print(f"{'domain':<8}{'metric':<8}{'ours':>8}{'theirs':>9}{'delta':>8}")
    for domain, metric, a, b, d in rows:
        print(f"{domain:<8}{metric:<8}{a:>8.2f}{b:>9.2f}{d:>+8.2f}")

    ok = worst <= args.tolerance
    print(
        f"\nnoisy-domain parity: worst |delta| = {worst:.2f} pp "
        f"({'WITHIN' if ok else 'OUTSIDE'} +/-{args.tolerance} pp)"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
