#!/usr/bin/env python3
"""Roofline the d2v self-supervised pretraining step on the real TPU.

The d2v step is the only stage that trains the full encoder (teacher fwd +
masked-student fwd/bwd + decoder fwd/bwd + AdamW + EMA), so it is the one
place a hidden perf gap could live. This tool:

1. builds make_d2v_train_step at the upstream-shaped settings recorded in
   PERFORMANCE.md (B=8 x 10 s crops, clone_batch=8, bf16 encoder),
2. measures steady-state ms/step twice (forward and reverse pass order, per
   the tunnel-drift rule),
3. reads XLA's own FLOP count from compiled.cost_analysis() and prints the
   effective TFLOP/s against the chip's measured bf16 dot ceiling
   (PERFORMANCE.md: 4096^3 bf16 84 TF/s; best conv 161 TF/s),
4. prints an analytic per-component FLOP breakdown so the XLA number can be
   sanity-checked, and
5. with TRACE=1 dumps a profiler trace and prints the top device ops
   (reusing tools/profile_step.py's Chrome-trace parser).

Usage: python tools/roofline_d2v.py [--batch 8] [--steps 12] [--fast]
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def conv_out_len(t, layers):
    for _, k, s in layers:
        t = (t - k) // s + 1
    return t


def analytic_flops(cfg, pcfg, batch):
    """Forward-MAC-based estimate (x2 FLOP/MAC, x3 for fwd+bwd where grads
    flow). Returns dict of component -> FLOPs per step."""
    D = cfg.embed_dim
    T_wav = pcfg.crop_size
    T = conv_out_len(T_wav, cfg.conv_feature_layers)
    B = batch
    M = max(1, pcfg.clone_batch)
    BM = B * M
    # span masking keeps ~ (1 - mask_prob) of tokens for the student
    T_kept = T - int(
        (pcfg.mask_prob * T / pcfg.mask_length + np.random.default_rng(0).random() * 0)
        * pcfg.mask_length
    )
    T_kept = max(T_kept, 1)

    # conv feature extractor: sum over layers of C_out*C_in*K*T_out MACs
    conv = 0
    t, cin = T_wav, 1
    for c, k, s in cfg.conv_feature_layers:
        t = (t - k) // s + 1
        conv += c * cin * k * t
        cin = c
    conv_fwd = 2 * conv * B  # FLOPs, per student batch B (runs before repeat)
    # positional conv: depth layers of grouped conv width w/depth over D ch
    w = max(3, cfg.conv_pos_width // cfg.conv_pos_depth)
    pos_per_frame = cfg.conv_pos_depth * (D * D // cfg.conv_pos_groups) * w
    pos_fwd_student = 2 * pos_per_frame * BM * T
    pos_fwd_teacher = 2 * pos_per_frame * B * T
    # transformer block: qkv+o 4D^2 + mlp 2*4D^2 = 12 D^2 MACs/token plus
    # attention 2*T*D MACs/token (scores + weighted sum)
    n_blocks = cfg.prenet_depth + cfg.depth

    def block_flops(tokens, tlen):
        return 2 * tokens * (12 * D * D + 2 * tlen * D) * n_blocks

    teacher_blocks = block_flops(B * T, T)
    student_blocks = block_flops(BM * T_kept, T_kept)
    # decoder: grouped conv layers + projection, on full T at BM
    dc = pcfg.decoder
    dec = (
        dc.decoder_layers * (dc.decoder_dim * dc.decoder_dim // dc.decoder_groups)
        * dc.decoder_kernel
        + dc.decoder_dim * D  # first layer in-dim actually D
        + dc.decoder_dim * D  # proj back to D
    )
    dec_fwd = 2 * dec * BM * T
    return {
        "conv frontend (fwd+bwd, B)": 3 * conv_fwd,
        "pos conv student (fwd+bwd, B*M)": 3 * pos_fwd_student,
        "pos conv teacher (fwd, B)": pos_fwd_teacher,
        "teacher blocks (fwd, B, full T)": teacher_blocks,
        "student blocks (fwd+bwd, B*M, kept T)": 3 * student_blocks,
        "decoder (fwd+bwd, B*M, full T)": 3 * dec_fwd,
    }, dict(T=T, T_kept=T_kept, BM=BM)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--fast", action="store_true",
                    help="fast_ln/fast_softmax/tanh-GELU encoder knobs")
    ap.add_argument("--crop", type=int, default=160_000)
    ap.add_argument("--clone-batch", type=int, default=8)
    ap.add_argument("--prng", default="threefry", choices=["threefry", "rbg"],
                    help="rbg = TPU-native generator (cheaper dropout/mask "
                         "draws; different stream than the default)")
    ap.add_argument("--ema-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="EMA-teacher storage dtype (round-4 bandwidth-floor "
                         "experiment)")
    ap.add_argument("--adam-mu-dtype", default=None, choices=["bfloat16"],
                    help="AdamW first-moment storage dtype")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize transformer blocks in the backward "
                         "pass (activation-traffic experiment, round 4)")
    args = ap.parse_args()

    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
        D2vPretrainConfig, EncoderConfig,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.d2v_pretrain import (
        init_d2v_state, make_d2v_train_step,
    )

    cfg = EncoderConfig(
        dtype="bfloat16",
        gelu_approximate=args.fast,
        fast_ln=args.fast,
        fast_softmax=args.fast,
    )
    pcfg = D2vPretrainConfig(
        batch_size=args.batch, crop_size=args.crop,
        clone_batch=args.clone_batch, ema_dtype=args.ema_dtype,
        adam_mu_dtype=args.adam_mu_dtype, remat_blocks=args.remat,
    )
    print(f"devices: {jax.devices()}", file=sys.stderr)

    def key(seed):
        # typed keys carry their impl through split()/flax fold_in
        impl = {"threefry": "threefry2x32"}.get(args.prng, args.prng)
        return jax.random.key(seed, impl=impl)

    model, tx, state = init_d2v_state(cfg, pcfg, key(0), example_len=args.crop)
    state = jax.device_put(state)
    step = make_d2v_train_step(model, tx)

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(args.batch, args.crop)) * 0.1, jnp.float32)
    pad = jnp.zeros((args.batch, args.crop), bool)

    # --- XLA's own cost model ---
    lowered = step.lower(state, wav, pad, key(1))
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    xla_flops = float(ca.get("flops", float("nan")))
    xla_bytes = float(ca.get("bytes accessed", float("nan")))

    # --- timing (donated state: rethread it) ---
    t0 = time.time()
    state, m = step(state, wav, pad, key(1))
    _ = float(m["loss"])
    print(f"compile+first: {time.time() - t0:.1f}s", file=sys.stderr)

    def run(n, tag):
        nonlocal state
        t0 = time.time()
        for i in range(n):
            state, m = step(state, wav, pad, key(2 + i))
        _ = float(m["loss"])
        dt = (time.time() - t0) / n * 1e3
        print(f"{tag}: {dt:.1f} ms/step", file=sys.stderr)
        return dt

    ms_a = run(args.steps, "pass A")
    ms_b = run(args.steps, "pass B")
    ms = min(ms_a, ms_b)

    if os.environ.get("TRACE", "0") == "1":
        logdir = "/tmp/xtrace_d2v"
        jax.profiler.start_trace(logdir)
        for i in range(3):
            state, m = step(state, wav, pad, key(99 + i))
        _ = float(m["loss"])
        jax.profiler.stop_trace()
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from profile_step import parse_chrome_trace
        parse_chrome_trace(logdir)

    comp, dims = analytic_flops(cfg, pcfg, args.batch)
    total_analytic = sum(comp.values())
    clips_s = args.batch / (ms / 1e3)
    print(f"\n== d2v roofline (B={args.batch}, crop={args.crop}, "
          f"clone_batch={args.clone_batch}, fast={args.fast}) ==")
    print(f"dims: T={dims['T']} frames, student kept T~{dims['T_kept']}, "
          f"student batch {dims['BM']}")
    for k, v in comp.items():
        print(f"  {k:<42}{v / 1e12:>8.3f} TFLOP")
    print(f"  {'analytic total':<42}{total_analytic / 1e12:>8.3f} TFLOP")
    print(f"XLA cost_analysis: {xla_flops / 1e12:.3f} TFLOP, "
          f"{xla_bytes / 1e9:.2f} GB accessed")
    print(f"steady state: {ms:.1f} ms/step (passes {ms_a:.1f}/{ms_b:.1f}) "
          f"-> {clips_s:.1f} clips/s ({clips_s * args.crop / 16000:.0f} audio-s/s)")
    flops = xla_flops if math.isfinite(xla_flops) and xla_flops > 0 else total_analytic
    eff = flops / (ms / 1e3) / 1e12
    print(f"effective {eff:.1f} TFLOP/s vs measured chip bf16 ceiling "
          f"~100-160 TF/s (PERFORMANCE.md) -> {eff / 120 * 100:.0f}% of ~120 TF/s")
    hbm = xla_bytes / (ms / 1e3) / 1e9 if math.isfinite(xla_bytes) else float("nan")
    print(f"HBM traffic rate {hbm:.0f} GB/s (v5e ~810 GB/s)")


if __name__ == "__main__":
    main()
