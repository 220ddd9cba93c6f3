#!/usr/bin/env python3
"""One real-chip run of the fused multi-noise ablation grid through the
PRODUCT surface (`cli ablation --from-wav --multi-noise`, VERDICT r3
item 4).

Builds the inputs in a temp dir (synthetic EMODB-style tone corpus, a
5types NOISEX-style bank, a tiny fairseq-layout encoder checkpoint +
matching --encoder-json), then exec's the CLI with a bounded grid
(--experiments 2 mechanisms x --multi-noise 2 injection cells) and reports
wall time plus the amortization evidence: extraction-pass count comes from
the CLI's own log lines ("extracting clean features once" must appear
exactly once; "rebuilding fixed noisy val/test domain" once per cell).

Usage: python tools/run_multinoise_chip.py [--epochs 3] [--clips 80]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np

TINY_ENC = dict(
    embed_dim=16, depth=2, num_heads=2, prenet_depth=1,
    conv_feature_layers=[[8, 4, 2], [8, 3, 2]],
    conv_pos_width=6, conv_pos_groups=2, conv_pos_depth=2,
    use_flash_attention=False, normalize_input=False,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--clips", type=int, default=80)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--full-size", action="store_true",
                    help="run with the PRODUCTION bf16 encoder (768d, 12 "
                         "blocks) instead of the tiny --encoder-json one — "
                         "proves the harness's compile/HBM/resident "
                         "behavior at product scale (VERDICT r4 item 6); "
                         "defaults the grid to 1 mechanism x 1 cell")
    ap.add_argument("--experiments", default=None,
                    help="mechanism list (default: 2 for tiny, 1 for "
                         "--full-size)")
    ap.add_argument("--cells", default=None,
                    help="--multi-noise cells (default: 2 for tiny, 1 for "
                         "--full-size)")
    args = ap.parse_args()
    experiments = args.experiments or (
        "full_method" if args.full_size else "full_method,no_repulsion"
    )
    cells = args.cells or ("babble@10" if args.full_size else
                           "babble@10,f16@10")
    n_cells = len(cells.split(","))

    import torch

    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.wavio import (
        write_wav,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
        EncoderConfig,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.manifests import (
        build_emodb_manifest,
    )
    from torch_mirror import rand_sd

    root = tempfile.mkdtemp(prefix="multinoise_chip_")
    wav_dir = os.path.join(root, "wav")
    os.makedirs(wav_dir)
    rng = np.random.default_rng(0)
    speakers = ["03", "08", "09", "10", "11", "12", "13", "14", "15", "16"]
    per = int(np.ceil(args.clips / len(speakers)))
    made = 0
    for spk in speakers:
        for j in range(per):
            if made >= args.clips:
                break
            c = made % 4
            secs = (1.0 + 1.0 * rng.random()) if args.full_size else (
                0.25 + 0.2 * rng.random()
            )
            n = int(16000 * secs)
            t = np.arange(n) / 16000.0
            wav = (0.08 + 0.12 * c) * np.sin(
                2 * np.pi * (200.0 * (c + 1) + rng.normal() * 3) * t
            ) + 0.01 * rng.normal(size=n)
            write_wav(os.path.join(wav_dir, f"{spk}a{j % 7}{'ATNL'[c]}a.wav"),
                      wav.astype(np.float32), 16000)
            made += 1
    manifest = os.path.join(root, "manifests")
    build_emodb_manifest(wav_dir, manifest)

    noise_root = os.path.join(root, "5types")
    os.makedirs(noise_root)
    for fname in ("babble.wav", "f16.wav", "factory1.wav", "hfchannel.wav",
                  "volvo.wav"):
        write_wav(os.path.join(noise_root, fname),
                  (rng.normal(size=48000) * 0.1).astype(np.float32), 16000)

    if args.full_size:
        # production encoder: full-size fairseq-layout random checkpoint,
        # bf16 extraction — no --encoder-json
        ckpt = os.path.join(root, "full_e2v.pt")
        torch.save({"model": rand_sd(EncoderConfig(), 0)}, ckpt)
        enc_args = ["--encoder-dtype", "bfloat16"]
    else:
        enc_json = os.path.join(root, "tiny_enc.json")
        with open(enc_json, "w") as f:
            json.dump(TINY_ENC, f)
        ckpt = os.path.join(root, "tiny_e2v.pt")
        enc_cfg_kw = dict(TINY_ENC)
        enc_cfg_kw["conv_feature_layers"] = tuple(
            tuple(x) for x in enc_cfg_kw["conv_feature_layers"]
        )
        torch.save({"model": rand_sd(EncoderConfig(**enc_cfg_kw), 0)}, ckpt)
        enc_args = ["--encoder-json", enc_json, "--encoder-dtype", "float32"]

    out = os.path.join(root, "multi.json")
    pkg = ("robust_speech_emotion_recognition_via_dynamic_asymmetric_"
           "distillation_in_noisy_environments_tpu")
    cmd = [
        sys.executable, "-m", pkg, "ablation", "--corpus", "emodb",
        "--from-wav", manifest, "--checkpoint", ckpt,
        *enc_args,
        "--noise-root", noise_root, "--suite", "granular",
        "--experiments", experiments,
        "--multi-noise", cells,
        "--epochs", str(args.epochs), "--warmup-epochs", "1",
        "--batch-size", str(args.batch), "--output", out,
    ]
    print("exec:", " ".join(cmd), file=sys.stderr)
    t0 = time.time()
    # APPEND the repo to PYTHONPATH (never replace: a bare PYTHONPATH
    # clobbers the TPU plugin registration — CLAUDE.md)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    proc = subprocess.run(cmd, cwd=root, capture_output=True, text=True,
                          env=env)
    wall = time.time() - t0
    log = proc.stdout + proc.stderr
    sys.stderr.write(log[-4000:])
    if proc.returncode != 0:
        print(f"FAILED rc={proc.returncode}")
        return 1

    clean_passes = log.count("extracting clean features once")
    refreshes = log.count("rebuilding fixed noisy val/test domain")
    wav_loads = log.count("loaded") if "loaded" in log else 0
    results = json.load(open(out))
    md = open(out.replace(".json", ".md")).read()
    print(f"\n== cli ablation --from-wav --multi-noise on "
          f"{os.environ.get('JAX_PLATFORMS', 'default')} ==")
    n_mech = len(experiments.split(","))
    print(f"wall: {wall:.1f}s for {n_mech} mechanisms x {n_cells} cells x "
          f"{args.epochs} epochs ({args.clips} clips, "
          f"{'FULL-SIZE bf16' if args.full_size else 'tiny f32'} encoder)")
    print(f"amortization: clean extraction passes = {clean_passes} "
          f"(expect 1), noisy-domain refreshes = {refreshes} (expect "
          f"{n_cells} = one per cell), wav-store loads = {wav_loads}")
    print(f"artifacts: {out} + .md ({'FAILED' in md and 'HAS FAILED ROWS' or 'no FAILED rows'})")
    for r in results:
        print(f"  {r['name']}: mean_noisy_wa={r['mean_noisy_wa']} "
              f"cells={sorted(r['per_noise'])}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
