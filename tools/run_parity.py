#!/usr/bin/env python3
"""North-star accuracy-parity run: this framework vs the torch reference
replica (tools/torch_replica.py), head-to-head on the same synthetic corpora.

BASELINE.md's operative target is fold-0 UA/WA parity within +/-0.5 pp
against a reproduced PyTorch reference run. The reference stack itself is not
runnable here (fairseq/timm absent, no corpora licensed in), so the
"reference numbers" come from the reference-faithful torch replica; both
sides train the full pipeline (supervised pretrain -> DAD cross-domain) on
identical feature stores and fold splits over N seeds, and the gate compares
seed-mean UA/WA.

RNG streams cannot be bit-matched across frameworks (SURVEY.md §7 "RNG
parity"), so this is a statistical-parity protocol: mean over >=5 seeds, both
sides seeing the same per-seed data, with the gate on the means.

Usage:
    python tools/run_parity.py [--seeds 5] [--epochs 40] [--out PARITY_REPORT.json]

Writes PARITY_REPORT.json at the repo root and prints a summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

# Force the virtual CPU platform before any jax backend init (the container
# pins JAX_PLATFORMS=axon; see tests/conftest.py for why config must be set
# too). The parity protocol is numerics-only, so CPU is the right target.
os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] = (
        os.environ["XLA_FLAGS"] + " --xla_force_host_platform_device_count=1"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (  # noqa: E402
    DADConfig,
    PretrainConfig,
    apply_overrides,
    dad_preset,
    pretrain_preset,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.store import (  # noqa: E402
    load_feature_store,
    write_feature_store,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.dad_trainer import (  # noqa: E402
    CrossDomainTrainer,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.pretrain import (  # noqa: E402
    pretrain_fold,
)

IEMOCAP_LABELS = ["ang", "hap", "neu", "sad"]
CASIA_LABELS = ["angry", "happy", "neutral", "sad"]
EMODB_SPEAKERS = ["03", "08", "09", "10", "11", "12", "13", "14", "15", "16"]

CORPUS_META = {
    # labels, speaker/group generator, sidecar kind
    "iemocap": dict(labels=IEMOCAP_LABELS, n_groups=5),
    "casia": dict(labels=CASIA_LABELS, n_groups=4),
    "emodb": dict(labels=CASIA_LABELS, n_groups=10),
}


def make_parity_corpus(
    out_clean: str,
    out_noisy: str,
    n: int = 600,
    dim: int = 48,
    seed: int = 1234,
    class_sep: float = 1.0,
    within_std: float = 2.1,
    frame_std: float = 1.0,
    noisy_shift: float = 1.1,
    noisy_std: float = 1.7,
    corpus: str = "iemocap",
):
    """Separable synthetic corpus pair (clean + noisy domain).

    Each clip has a latent class vector mu_c + within-class jitter; frames are
    the latent + per-frame noise (mean-pooling recovers the latent). The
    noisy domain adds a shared domain-shift bias + extra jitter, so (a) the
    clean task is learnable to ~90%+, (b) the noisy domain degrades, and
    (c) distribution alignment (ECDA) has real work to do. Same clip
    lengths/labels/session ids in both domains, mirroring how the reference
    extracts features from clean and noise-injected copies of the same wavs.

    ``corpus`` controls the group structure and sidecar format: IEMOCAP
    writes ``.emo`` with session-coded names (5-fold session rotation),
    CASIA writes ``.lbl``/``.spk`` with 4 speakers, EMODB with the 10 fixed
    LOSO speakers — so each preset's real fold policy is exercised.
    """
    meta = CORPUS_META[corpus]
    label_names = meta["labels"]
    rng = np.random.default_rng(seed)
    mu = rng.normal(size=(4, dim)) * class_sep
    shift = rng.normal(size=(dim,)) * noisy_shift
    clean_clips, noisy_clips, labels, names, speakers = [], [], [], [], []
    for i in range(n):
        c = i % 4
        t = int(rng.integers(20, 60))
        latent = mu[c] + rng.normal(size=(dim,)) * within_std
        frames = latent[None, :] + rng.normal(size=(t, dim)) * frame_std
        noisy_latent = latent + shift + rng.normal(size=(dim,)) * noisy_std
        noisy_frames = noisy_latent[None, :] + rng.normal(size=(t, dim)) * frame_std
        clean_clips.append(frames.astype(np.float32))
        noisy_clips.append(noisy_frames.astype(np.float32))
        labels.append(label_names[c])
        group = (i // 4) % meta["n_groups"]  # every group sees every class
        if corpus == "iemocap":
            names.append(f"Ses0{group + 1}F_impro0{i % 9}_F{i:03d}")
            speakers.append(None)
        elif corpus == "casia":
            names.append(f"utt_{i:04d}")
            speakers.append(f"casia_spk_{group + 1}")
        else:  # emodb
            names.append(f"{EMODB_SPEAKERS[group]}a{i % 7}{'ATLN'[c]}a_{i:03d}")
            speakers.append(f"emodb_spk_{EMODB_SPEAKERS[group]}")
    sidecar = "emo" if corpus == "iemocap" else "lbl"
    spk = None if corpus == "iemocap" else speakers
    write_feature_store(out_clean, clean_clips, labels=labels, utt_names=names,
                        speakers=spk, sidecar=sidecar)
    write_feature_store(out_noisy, noisy_clips, labels=labels, utt_names=names,
                        speakers=spk, sidecar=sidecar)


def build_configs(dim: int, epochs: int, seed: int, tmpdir: str,
                  corpus: str = "iemocap"):
    """Corpus presets (the real per-corpus hyperparameter divergences:
    CASIA fixed-threshold/no-ECDA, EMODB beta=0.8/LR=5e-3) scaled down to
    parity-protocol size."""
    pre_cfg = pretrain_preset(
        corpus,
        input_dim=dim,
        batch_size=32,
        max_epochs=max(epochs, 30),
        random_seed=seed,
        save_dir=os.path.join(tmpdir, f"pretrain_s{seed}"),
    )
    warm = max(epochs // 5, 2)
    dad_cfg = dad_preset(
        corpus,
        input_dim=dim,
        batch_size=32,
        epochs=epochs,
        warmup_epochs=warm,
        ecda_start_epoch=warm,
        weight_ramp_epochs=warm,
        validation_interval=5,
        random_seed=seed,
        results_base_dir=os.path.join(tmpdir, f"dad_s{seed}"),
    )
    return pre_cfg, dad_cfg


def run_jax_side(pre_cfg, dad_cfg, clean_store, noisy_store, fold=0):
    pre = pretrain_fold(pre_cfg, clean_store, fold)
    trainer = CrossDomainTrainer(
        dad_cfg,
        fold=fold,
        clean_store=clean_store,
        noisy_store=noisy_store,
        pretrain_params=pre["params"],
    )
    out = trainer.train()
    if "noisy_test" not in out:
        raise RuntimeError(
            "no best checkpoint was saved — parity cannot score last-epoch "
            "weights as a best-model result"
        )
    return {
        "pretrain_test_wa": pre["test"]["weighted_accuracy"] * 100,
        "best_noisy_val_wa": trainer.best_noisy_weighted_acc,
        "clean_test": out["clean_test"],
        "noisy_test": out["noisy_test"],
    }


def run_torch_side(pre_cfg, dad_cfg, clean_store, noisy_store, fold=0):
    from torch_replica import dad_train_fold_torch, pretrain_fold_torch

    pre = pretrain_fold_torch(pre_cfg, clean_store, fold)
    out = dad_train_fold_torch(
        dad_cfg, clean_store, noisy_store, fold, pretrain_sd=pre["state_dict"]
    )
    return {
        "pretrain_test_wa": pre["test"]["weighted_accuracy"],
        "best_noisy_val_wa": out["best_noisy_weighted_acc"],
        "clean_test": out["clean_test"],
        "noisy_test": out["noisy_test"],
    }


def summarize(rows, key_path):
    def get(r):
        v = r
        for k in key_path:
            v = v[k]
        return float(v)

    vals = [get(r) for r in rows]
    return float(np.mean(vals)), float(np.std(vals)), vals


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--n-clips", type=int, default=600)
    ap.add_argument("--dim", type=int, default=48)
    ap.add_argument("--fold", type=int, default=0)
    ap.add_argument("--tolerance", type=float, default=0.5)
    ap.add_argument("--corpus", choices=["iemocap", "casia", "emodb"],
                    default="iemocap")
    ap.add_argument("--out", default=None,
                    help="default PARITY_REPORT.json (iemocap) / "
                         "PARITY_REPORT_<corpus>.json")
    ap.add_argument("--seed-start", type=int, default=0,
                    help="first seed to run (extend an earlier report's "
                         "0..N-1 range without re-running it)")
    ap.add_argument("--merge-from", default=None,
                    help="existing report whose per-seed values are "
                         "prepended before the summary stats (protocol "
                         "must match: same corpus/epochs/n_clips/dim)")
    args = ap.parse_args(argv)
    if args.out is None:
        args.out = ("PARITY_REPORT.json" if args.corpus == "iemocap"
                    else f"PARITY_REPORT_{args.corpus}.json")

    tmpdir = tempfile.mkdtemp(prefix="parity_")
    clean_dir = os.path.join(tmpdir, "clean")
    noisy_dir = os.path.join(tmpdir, "root2-10db")
    make_parity_corpus(clean_dir, noisy_dir, n=args.n_clips, dim=args.dim,
                       corpus=args.corpus)
    label_map = {k: i for i, k in enumerate(CORPUS_META[args.corpus]["labels"])}
    clean_store = load_feature_store(clean_dir, label_map)
    noisy_store = load_feature_store(noisy_dir, label_map)

    jax_rows, torch_rows = [], []
    for seed in range(args.seed_start, args.seeds):
        pre_cfg, dad_cfg = build_configs(args.dim, args.epochs, seed, tmpdir,
                                         corpus=args.corpus)
        t0 = time.time()
        torch_rows.append(run_torch_side(pre_cfg, dad_cfg, clean_store, noisy_store, args.fold))
        t1 = time.time()
        jax_rows.append(run_jax_side(pre_cfg, dad_cfg, clean_store, noisy_store, args.fold))
        t2 = time.time()
        print(
            f"seed {seed}: torch noisy UA {torch_rows[-1]['noisy_test']['weighted_accuracy']:.2f}% "
            f"({t1 - t0:.0f}s) | jax noisy UA {jax_rows[-1]['noisy_test']['weighted_accuracy']:.2f}% "
            f"({t2 - t1:.0f}s)",
            flush=True,
        )

    metrics = {
        "noisy_UA": ("noisy_test", "weighted_accuracy"),
        "noisy_WA": ("noisy_test", "accuracy"),
        "noisy_WF1": ("noisy_test", "f1_weighted"),
        "clean_UA": ("clean_test", "weighted_accuracy"),
        "clean_WA": ("clean_test", "accuracy"),
        "pretrain_UA": ("pretrain_test_wa",),
    }
    prev = None
    if args.merge_from:
        with open(args.merge_from) as f:
            prev = json.load(f)
        for k in ("epochs", "n_clips", "dim", "preset", "fold"):
            old = prev["protocol"].get(k)
            new = {"epochs": args.epochs, "n_clips": args.n_clips,
                   "dim": args.dim, "preset": args.corpus,
                   "fold": args.fold}[k]
            if old != new:
                raise SystemExit(
                    f"--merge-from protocol mismatch on {k}: {old} != {new}"
                )

    table, worst_noisy = {}, 0.0
    for name, path in metrics.items():
        jm, js, jv = summarize(jax_rows, path)
        tm, ts, tv = summarize(torch_rows, path)
        if prev is not None:
            jv = list(prev["metrics"][name]["jax_per_seed"]) + jv
            tv = list(prev["metrics"][name]["torch_per_seed"]) + tv
            jm, js = float(np.mean(jv)), float(np.std(jv))
            tm, ts = float(np.mean(tv)), float(np.std(tv))
        delta = jm - tm
        if name.startswith("noisy_") and name != "noisy_WF1":
            worst_noisy = max(worst_noisy, abs(delta))
        # SE of the delta + Welch t so a gate miss can be read as noise vs
        # systematic (both sides train on the same per-seed data, but RNG
        # streams differ — SURVEY §7 RNG parity)
        n = max(len(jv), 1)
        se = float(np.sqrt(js**2 / n + ts**2 / n))
        table[name] = {
            "jax_mean": jm, "jax_std": js, "jax_per_seed": jv,
            "torch_mean": tm, "torch_std": ts, "torch_per_seed": tv,
            "delta_pp": delta,
            "delta_se_pp": se,
            "welch_t": delta / se if se > 0 else 0.0,
        }

    ok = worst_noisy <= args.tolerance
    report = {
        "protocol": {
            "seeds": args.seeds, "epochs": args.epochs, "fold": args.fold,
            "n_clips": args.n_clips, "dim": args.dim,
            "corpus": f"synthetic {args.corpus}-style "
                      "(see tools/run_parity.py:make_parity_corpus)",
            "preset": args.corpus,
            "gate": f"mean noisy-domain UA/WA delta within +/-{args.tolerance} pp",
        },
        "metrics": table,
        "worst_noisy_delta_pp": worst_noisy,
        "within_tolerance": ok,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)

    print(f"\n{'metric':<14}{'jax':>10}{'torch':>10}{'delta':>9}{'±SE':>7}{'t':>7}")
    for name, row in table.items():
        print(
            f"{name:<14}{row['jax_mean']:>9.2f}%{row['torch_mean']:>9.2f}%"
            f"{row['delta_pp']:>+8.2f}{row['delta_se_pp']:>7.2f}{row['welch_t']:>+7.1f}"
        )
    print(
        f"\nnoisy-domain parity: worst |delta| = {worst_noisy:.2f} pp "
        f"({'WITHIN' if ok else 'OUTSIDE'} +/-{args.tolerance} pp) -> {args.out}"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
