#!/usr/bin/env python3
"""Real-chip A/B: device-resident corpus vs host streaming for the fused
trainer (VERDICT r3 item 2).

Round 3 measured the fused TRAINER at ~108 clips/s f32 / ~159 clips/s bf16
transfers on this rig — 24x below the same program's 3855 clips/s device
capability — because each step re-uploaded ~14 MB of STATIC corpus bytes
over the ~28 MB/s tunnel. The resident path uploads the corpus once and
ships ~KB of indices per step.

Method (PERFORMANCE.md two-order rule): two trainer instances share one
``prepare_fused_shared`` startup; epochs alternate A/B/A/B and the whole
sweep runs again in the reverse order to cancel time-correlated tunnel
drift. Timing is steady-state epochs (first epoch per trainer = compile,
excluded).

Usage: python tools/bench_resident.py [--clips 320] [--secs 2.0]
       [--batch 64] [--epochs 3]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_corpus(root, n_clips, secs, sr=16000):
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.wavio import (
        write_wav,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.manifests import (
        build_emodb_manifest,
    )

    wav_dir = os.path.join(root, "wav")
    os.makedirs(wav_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    speakers = ["03", "08", "09", "10", "11", "12", "13", "14", "15", "16"]
    per = int(np.ceil(n_clips / len(speakers)))
    made = 0
    for spk in speakers:
        for j in range(per):
            if made >= n_clips:
                break
            c = made % 4
            n = int(sr * secs * (0.8 + 0.4 * rng.random()))
            t = np.arange(n) / sr
            wav = (0.08 + 0.12 * c) * np.sin(2 * np.pi * 200.0 * (c + 1) * t)
            write_wav(os.path.join(wav_dir, f"{spk}a{j}{'ATNL'[c]}a.wav"),
                      wav.astype(np.float32), sr)
            made += 1
    dest = os.path.join(root, "manifests")
    build_emodb_manifest(wav_dir, dest)
    return dest


def make_corpus_iemocap(root, n_clips, sr=16000):
    """IEMOCAP-shaped synthetic corpus at the real scale: sessions 1-5
    (fold 0 trains on 1-3), .emo sidecar naming (Ses0X..., label from the
    4-class map), and a lognormal length mix (median ~4 s, clipped
    1-20 s) approximating the real store's bucket distribution."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.wavio import (
        write_wav,
    )

    wav_dir = os.path.join(root, "wav")
    os.makedirs(wav_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    labels = ["ang", "hap", "neu", "sad"]
    dest = os.path.join(root, "manifests")
    os.makedirs(dest, exist_ok=True)
    tsv = open(os.path.join(dest, "train.tsv"), "w")
    emo = open(os.path.join(dest, "train.emo"), "w")
    print(wav_dir, file=tsv)
    total_s = 0.0
    for i in range(n_clips):
        sess = i % 5 + 1
        c = (i // 5) % 4
        secs = float(np.clip(rng.lognormal(np.log(4.0), 0.5), 1.0, 20.0))
        total_s += secs
        n = int(sr * secs)
        t = np.arange(n) / sr
        wav = (0.08 + 0.12 * c) * np.sin(2 * np.pi * 200.0 * (c + 1) * t)
        name = f"Ses0{sess}F_impro0{c + 1}_F{i:05d}"
        write_wav(os.path.join(wav_dir, name + ".wav"),
                  wav.astype(np.float32), sr)
        print(f"{name}.wav\t{n}", file=tsv)
        print(f"{name}\t{labels[c]}", file=emo)
    tsv.close()
    emo.close()
    print(f"iemocap-style corpus: {n_clips} clips, {total_s / 3600:.2f} h "
          f"({total_s / n_clips:.2f} s/clip mean)", file=sys.stderr)
    return dest


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=320)
    ap.add_argument("--secs", type=float, default=2.0)
    ap.add_argument("--style", choices=["emodb", "iemocap"], default="emodb",
                    help="iemocap: 5-session .emo corpus with a lognormal "
                         "length mix at the real bucket distribution "
                         "(--secs ignored); preset/fold policy follows")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=3,
                    help="timed steady-state epochs per trainer per order")
    ap.add_argument("--scan-chunk", type=int, default=8,
                    help="steps per dispatch for the resident_scan variant")
    ap.add_argument("--variants", type=str, default="",
                    help="comma-separated subset of "
                         "stream_f32,stream_bf16,resident,resident_scan "
                         "(default: all)")
    args = ap.parse_args()

    import jax

    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
        EncoderConfig, dad_preset,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.parallel.fused import (
        FusedConfig,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.fused_trainer import (
        FusedCrossDomainTrainer, prepare_fused_shared,
    )

    print(f"devices: {jax.devices()}", file=sys.stderr)
    root = tempfile.mkdtemp(prefix="bench_resident_")
    if args.style == "iemocap":
        manifest = make_corpus_iemocap(root, args.clips)
    else:
        manifest = make_corpus(root, args.clips, args.secs)

    enc_cfg = EncoderConfig(dtype="bfloat16", gelu_approximate=True)
    cfg = dad_preset(
        args.style, batch_size=args.batch, epochs=500, warmup_epochs=1,
        ecda_start_epoch=1, validation_interval=10_000,
        results_base_dir=os.path.join(root, "results"),
    )
    fused = FusedConfig(encoder=enc_cfg, dad=cfg, inject_snr_db=10.0,
                        cache_clean_features=True)

    t0 = time.time()
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.emotion2vec import (
        Emotion2vecEncoder,
    )

    enc = Emotion2vecEncoder(enc_cfg)
    enc_params = enc.init(jax.random.PRNGKey(0),
                          np.zeros((1, 16000), np.float32))
    shared = prepare_fused_shared(cfg, manifest, enc_cfg, enc_params, fused,
                                  None, extract_batch_size=args.batch)
    print(f"shared startup (decode + 2 extraction passes): "
          f"{time.time() - t0:.1f}s", file=sys.stderr)

    def build(resident, sub, transfer_dtype=None, scan_chunk=0,
              bucket=False, enc=None):
        from dataclasses import replace as dc_replace

        c = dad_preset(
            args.style, batch_size=args.batch, epochs=500, warmup_epochs=1,
            ecda_start_epoch=1, validation_interval=10_000,
            results_base_dir=os.path.join(root, "results", sub),
            bucket_batches=bucket,
        )
        e = enc_cfg if enc is None else dc_replace(enc_cfg, **enc)
        return FusedCrossDomainTrainer(
            c, manifest, e, enc_params,
            fused_cfg=FusedConfig(encoder=e, dad=c,
                                  inject_snr_db=10.0,
                                  cache_clean_features=True),
            fold=0, prefetch_depth=2, shared=shared, resident=resident,
            transfer_dtype=transfer_dtype, scan_chunk=scan_chunk,
        )

    builders = {
        "stream_f32": lambda: build(False, "s32"),
        "stream_bf16": lambda: build(False, "s16", transfer_dtype="bfloat16"),
        "resident": lambda: build(True, "res"),
        "resident_scan": lambda: build(True, "rscan",
                                       scan_chunk=args.scan_chunk),
        # round-5 remedies for the product-scale bucket-tail tax
        # (PERFORMANCE.md r5): bucket-homogeneous batches, then + per-shape
        # Pallas routing at the long buckets
        "resident_bucket": lambda: build(True, "rb", bucket=True),
        "resident_bucket_flash": lambda: build(
            True, "rbf", bucket=True, enc={"use_flash_attention": "auto"}),
        "resident_flash": lambda: build(
            True, "rf", enc={"use_flash_attention": "auto"}),
    }
    wanted = ([v.strip() for v in args.variants.split(",") if v.strip()]
              or list(builders))
    unknown = [v for v in wanted if v not in builders]
    if unknown:
        ap.error(f"unknown --variants {unknown}; choose from {list(builders)}")
    trainers = {k: builders[k]() for k in wanted}
    n_steps = {k: min(len(t.clean_train), len(t.noisy_wav_train))
               for k, t in trainers.items()}

    # warm every trainer (compile epoch, untimed)
    for k, t in trainers.items():
        tw = time.time()
        t.train_epoch(4)  # post-warmup epoch: the full program
        print(f"warm {k}: {time.time() - tw:.1f}s", file=sys.stderr)

    results = {k: [] for k in trainers}

    def sweep(order, tag):
        for epoch in range(5, 5 + args.epochs):
            for k in order:
                t = trainers[k]
                te = time.time()
                t.train_epoch(epoch)
                dt = time.time() - te
                clips = 2 * args.batch * n_steps[k] / dt
                results[k].append(clips)
                print(f"[{tag}] {k} epoch {epoch}: {dt:.2f}s -> "
                      f"{clips:.1f} clips/s", file=sys.stderr)

    keys = list(trainers)
    sweep(keys, "fwd")
    sweep(keys[::-1], "rev")

    print("\n== fused trainer e2e clips/s (median over "
          f"{2 * args.epochs} interleaved epochs, both orders) ==")
    for k, v in results.items():
        print(f"  {k:<14} median {np.median(v):8.1f}  "
              f"(all: {[round(x, 1) for x in v]})")


if __name__ == "__main__":
    main()
