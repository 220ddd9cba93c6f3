#!/usr/bin/env python3
"""Measure the PINNED torch-CPU baseline for bench.py (VERDICT r3 item 3).

The live torch-CPU denominator swung 1.14 -> 0.93 -> 0.33 clips/s across
rounds purely with box contention, making ``vs_baseline`` noise. This tool
produces the pin: it WAITS for the 1-minute load average to drop under
--max-load, then runs bench.bench_torch_baseline() N times and prints each
run + the median. Paste the median into bench.py PINNED_BASELINE_CPS and
BASELINE.md.

Usage: python tools/pin_baseline.py [--runs 5] [--max-load 0.5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--max-load", type=float, default=0.5)
    ap.add_argument("--wait-timeout", type=float, default=7200,
                    help="give up waiting for idle after this many seconds")
    args = ap.parse_args()

    t0 = time.time()
    while True:
        load = os.getloadavg()[0]
        if load <= args.max_load:
            break
        if time.time() - t0 > args.wait_timeout:
            print(f"WARNING: load never dropped below {args.max_load} "
                  f"(now {load:.2f}) — measuring anyway", flush=True)
            break
        print(f"waiting for idle box: load {load:.2f} > {args.max_load}",
              flush=True)
        time.sleep(60)

    import bench

    vals = []
    for i in range(args.runs):
        load = os.getloadavg()[0]
        cps = bench.bench_torch_baseline()
        vals.append(cps)
        print(f"run {i + 1}/{args.runs}: {cps:.3f} clips/s (load {load:.2f})",
              flush=True)
    med = float(np.median(vals))
    print(f"\nPINNED torch-CPU baseline: median {med:.3f} clips/s over "
          f"{args.runs} runs ({[round(v, 3) for v in vals]})")
    print("-> set bench.py PINNED_BASELINE_CPS and record in BASELINE.md")


if __name__ == "__main__":
    main()
