#!/usr/bin/env python3
"""Profile the fused extract+train bench step on the real TPU and print the
top device ops from the Chrome trace (the xplane schema here doesn't match
our wire parser; trace.json.gz has full device events — see memory notes).

Usage: python tools/profile_step.py [logdir]
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp
import numpy as np


def run_and_trace(logdir):
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
        EncoderConfig, dad_preset,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.dad import (
        StepScalars,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.parallel import (
        FusedConfig, init_fused, make_fused_extract_train_step,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.parallel.fused import (
        FusedBatch,
    )

    B, T = 64, 64000
    import os
    fl = os.environ.get("FAST_LN","1")=="1"; fs = os.environ.get("FAST_SM","1")=="1"
    enc_cfg = EncoderConfig(dtype="bfloat16", gelu_approximate=True, fast_ln=fl, fast_softmax=fs)
    dad_cfg = dad_preset("iemocap", batch_size=B, warmup_epochs=1,
                         ecda_start_epoch=1, epochs=500)
    cached = os.environ.get("CACHED", "0") == "1"
    cfg = FusedConfig(encoder=enc_cfg, dad=dad_cfg, inject_snr_db=10.0,
                      cache_clean_features=cached)
    encoder, enc_params, head, tx, state = init_fused(cfg, jax.random.PRNGKey(0), example_len=T)
    step = make_fused_extract_train_step(encoder, head, tx, cfg, mesh=None)

    rng = np.random.default_rng(0)

    def batch(labeled):
        labels = rng.integers(0, 4, B).astype(np.int32) if labeled else np.full(B, -1, np.int32)
        return FusedBatch(
            wav=jnp.asarray(rng.normal(size=(B, T)) * 0.1, jnp.float32),
            wav_mask=jnp.zeros((B, T), bool),
            labels=jnp.asarray(labels),
            row_valid=jnp.ones(B, bool),
        )

    clean, noisy = batch(True), batch(False)
    if cached:
        from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.parallel import (
            precompute_clean_features,
        )
        clean = jax.jit(lambda p, c: precompute_clean_features(encoder, p, cfg, c))(enc_params, clean)
        float(jnp.sum(clean.feats))
    scalars = StepScalars.for_epoch(dad_cfg, 40)
    anchors = jnp.zeros(4)

    t0 = time.time()
    state, m = step(enc_params, state, clean, noisy, scalars, anchors, jax.random.PRNGKey(0))
    print(f"compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    for i in range(5):
        state, m = step(enc_params, state, clean, noisy, scalars, anchors, jax.random.PRNGKey(i))
    _ = float(m["total_loss"])
    print(f"steady: {(time.time()-t0)/5*1e3:.1f} ms/step", file=sys.stderr)

    jax.profiler.start_trace(logdir)
    for i in range(3):
        state, m = step(enc_params, state, clean, noisy, scalars, anchors, jax.random.PRNGKey(i))
    _ = float(m["total_loss"])
    jax.profiler.stop_trace()


def parse_chrome_trace(logdir, top_n=35):
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace.json.gz found under", logdir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pid names containing "TPU" and not "Host"
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dur_by_name = defaultdict(float)
    cnt_by_name = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        dur_by_name[name] += dur
        cnt_by_name[name] += 1
        total += dur
    print(f"\ntrace: {path}\ntotal device time {total:.1f} ms over traced steps")
    rows = sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:top_n]
    print(f"{'op':<72}{'ms':>9}{'n':>5}")
    for name, d in rows:
        print(f"{name[:72]:<72}{d:>9.2f}{cnt_by_name[name]:>5}")


if __name__ == "__main__":
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xtrace_step"
    run_and_trace(logdir)
    parse_chrome_trace(logdir)
