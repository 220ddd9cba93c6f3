#!/usr/bin/env python3
"""E2E A/B of the d2v pretraining DRIVER on the real chip: host-streaming
(the round-3 best: lag-1 guards + bf16 wav transfers) vs the round-5
device-resident corpus (HBM-committed audio + on-device crop gathers,
parallel/resident.py make_resident_d2v_step).

PERFORMANCE.md round 3 measured the streaming driver at 283 ms/step against
its own 212 ms device step at the roofline settings (B=16, 10 s crops,
clone_batch=8, rbg + fast knobs) — the gap being the ~10 MB/step wav upload
+ dispatch. The resident path ships ~KB of (clip, start) indices instead;
this tool measures what that buys end-to-end, with the two-order rule
(variants interleaved, sweep repeated in reverse) to cancel tunnel drift.

Method: each run is `run_d2v_pretrain` itself (real driver: lag-1 guards,
history, epoch boundaries) over a packed synthetic corpus; steady-state
ms/step is the wall-clock slope of the per-step history entries over the
post-compile window (log_every=1).

Usage: python tools/bench_d2v_driver.py [--clips 128 --secs 12 --batch 16
       --steps 48 --crop 160000 --clone-batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def make_corpus(tmp: str, n_clips: int, secs: float, sr: int = 16000) -> str:
    """Synthetic wav corpus + manifest + packed store; returns packed dir."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.wavio import (
        write_wav,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.binarized import (
        pack_manifest,
    )

    root = os.path.join(tmp, "wavs")
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n_clips):
        n = int(sr * secs * (0.9 + 0.2 * rng.random()))
        write_wav(os.path.join(root, f"clip{i}.wav"),
                  (rng.normal(size=n) * 0.1).astype(np.float32), sr)
        rows.append((f"clip{i}.wav", n))
    mdir = os.path.join(tmp, "manifests")
    os.makedirs(mdir, exist_ok=True)
    with open(os.path.join(mdir, "train.tsv"), "w") as f:
        print(root, file=f)
        for rel, n in rows:
            print(f"{rel}\t{n}", file=f)
    packed = os.path.join(tmp, "packed")
    pack_manifest(mdir, packed)
    return packed


def steady_ms(history, first_step: int) -> float:
    """Wall-clock slope of per-step history entries from first_step on."""
    ent = [e for e in history if "loss" in e and e["step"] >= first_step]
    if len(ent) < 2:
        raise RuntimeError(f"too few steady entries: {len(ent)}")
    return (ent[-1]["wall_s"] - ent[0]["wall_s"]) / (
        ent[-1]["step"] - ent[0]["step"]
    ) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=128)
    ap.add_argument("--secs", type=float, default=12.0)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--crop", type=int, default=160_000)
    ap.add_argument("--clone-batch", type=int, default=8)
    ap.add_argument("--steady-from", type=int, default=6,
                    help="first step of the steady-state window")
    args = ap.parse_args()

    import jax  # noqa: F401  (device init before timing)

    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
        D2vPretrainConfig,
        EncoderConfig,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.d2v_pretrain import (
        run_d2v_pretrain,
    )

    tmp = tempfile.mkdtemp(prefix="bench_d2v_driver_")
    packed = make_corpus(tmp, args.clips, args.secs)
    print(f"corpus: {args.clips} clips x ~{args.secs}s -> {packed}",
          file=sys.stderr)

    cfg = EncoderConfig(dtype="bfloat16", gelu_approximate=True,
                        fast_ln=True, fast_softmax=True)
    pcfg = D2vPretrainConfig(
        batch_size=args.batch, crop_size=args.crop,
        clone_batch=args.clone_batch, max_steps=args.steps,
        warmup_steps=2, rng_impl="rbg",
    )

    variants = {
        "stream_bf16": dict(transfer_dtype="bfloat16", resident=False),
        "resident": dict(resident=True),
    }
    results = {k: [] for k in variants}
    order_log = []
    for sweep, names in enumerate(
        [list(variants), list(reversed(list(variants)))]
    ):
        for name in names:
            save = os.path.join(tmp, f"{name}_{sweep}")
            t0 = time.time()
            run_d2v_pretrain(cfg, pcfg, [packed], save, log_every=1,
                             checkpoint_every=0, binarized=True,
                             **variants[name])
            wall = time.time() - t0
            with open(os.path.join(save, "d2v_training_history.json")) as f:
                hist = json.load(f)
            ms = steady_ms(hist, args.steady_from)
            results[name].append(ms)
            order_log.append((sweep, name, round(ms, 1), round(wall, 1)))
            print(f"sweep {sweep} {name}: steady {ms:.1f} ms/step "
                  f"(run wall {wall:.1f}s)", file=sys.stderr)

    out = {
        "settings": vars(args),
        "runs": order_log,
        "ms_per_step": {k: [round(v, 1) for v in vs]
                        for k, vs in results.items()},
        "median_ms": {k: round(float(np.median(vs)), 1)
                      for k, vs in results.items()},
        "clips_per_s": {
            k: round(args.batch / (float(np.median(vs)) / 1e3), 1)
            for k, vs in results.items()
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
