"""End-to-end CLI integration: manifest -> inject -> extract -> pretrain ->
dad -> infer, all through cli.main() on a tiny synthetic EMODB corpus with a
tiny encoder — the whole user-facing pipeline in one test."""

import json
import os

import numpy as np
import pytest
import torch

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.wavio import (
    write_wav,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.cli import (
    main as cli,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
    EncoderConfig,
)

from torch_mirror import rand_sd

TINY_JSON = json.dumps(
    {
        "embed_dim": 16,
        "depth": 2,
        "num_heads": 2,
        "prenet_depth": 1,
        "conv_feature_layers": [[8, 4, 2], [8, 3, 2]],
        "conv_pos_width": 6,
        "conv_pos_groups": 2,
        "conv_pos_depth": 2,
        "dtype": "float32",
        "use_flash_attention": False,
    }
)


@pytest.mark.slow
def test_full_cli_pipeline(tmp_path, monkeypatch, rng):
    monkeypatch.chdir(tmp_path)

    # 1. synthetic EMODB corpus: 10 speakers x 4 clips, class-coded tones
    os.makedirs("corpus")
    codes = ["A", "T", "L", "N"]
    for s in ["03", "08", "09", "10", "11", "12", "13", "14", "15", "16"]:
        for i in range(4):
            t = np.arange(800 + 100 * (i % 2)) / 16000
            f = 400 + 900 * codes.index(codes[i % 4])
            wav = 0.3 * np.sin(2 * np.pi * f * t) + rng.normal(0, 0.01, len(t))
            write_wav(f"corpus/{s}a0{i}{codes[i % 4]}a.wav", wav, 16000)

    assert cli(["manifest", "--corpus", "emodb", "--root", "corpus",
                "--dest", "manifests"]) == 0
    assert os.path.exists("manifests/train.tsv")

    # 2. noise injection + verification
    assert cli(["inject", "--input_root", "corpus", "--output_root",
                "root1-white-10db", "--snr_db", "10",
                "--manifest_path", "manifests/train.tsv", "--verify"]) == 0

    # 3. extraction (tiny encoder from a synthetic fairseq checkpoint)
    tiny = EncoderConfig(
        embed_dim=16, depth=2, num_heads=2, prenet_depth=1,
        conv_feature_layers=((8, 4, 2), (8, 3, 2)),
        conv_pos_width=6, conv_pos_groups=2, conv_pos_depth=2,
        dtype="float32", use_flash_attention=False,
    )
    torch.save({"model": rand_sd(tiny, seed=0)}, "e2v.pt")
    assert cli(["extract", "--data", "manifests", "--checkpoint", "e2v.pt",
                "--save-dir", "features", "--batch-size", "8",
                "--encoder-json", TINY_JSON]) == 0
    # noisy manifest = same entries, noisy root
    os.makedirs("manifests_noisy")
    lines = open("manifests/train.tsv").read().split("\n")
    with open("manifests_noisy/train.tsv", "w") as f:
        print("root1-white-10db", file=f)
        f.write("\n".join(lines[1:]))
    for ext in (".lbl", ".spk"):
        open("manifests_noisy/train" + ext, "w").write(
            open("manifests/train" + ext).read()
        )
    assert cli(["extract", "--data", "manifests_noisy", "--checkpoint", "e2v.pt",
                "--save-dir", "features_noisy", "--batch-size", "8",
                "--encoder-json", TINY_JSON]) == 0

    # 4. pretrain (fold 0, few epochs)
    assert cli(["pretrain", "--corpus", "emodb", "--feat-path", "features",
                "--save-dir", "pm", "--max-epochs", "3", "--folds", "0"]) == 0
    assert os.path.exists("pm/best_model_fold_1.ckpt")

    # 5. DAD stage — patch the preset dims to the tiny encoder via argv epochs
    #    (input_dim must match the tiny features: 16)
    import robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs.presets as presets

    orig = presets.dad_preset

    def tiny_dad(corpus, overrides=None, **kw):
        # hidden_dim must stay 256 to match the pretrain checkpoint layout
        kw.setdefault("batch_size", 16)
        kw.setdefault("warmup_epochs", 1)
        kw.setdefault("ecda_start_epoch", 1)
        kw.setdefault("validation_interval", 1)
        kw.setdefault("length_buckets", (64,))
        return orig(corpus, overrides, **kw)

    # the CLI resolves dad_preset from .configs at call time
    monkeypatch.setattr(presets, "dad_preset", tiny_dad)
    import robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs as cfgs

    monkeypatch.setattr(cfgs, "dad_preset", tiny_dad)

    assert cli(["dad", "--corpus", "emodb", "--clean", "features",
                "--noisy", "features_noisy",
                "--weights", "pm/best_model_fold_1.ckpt",
                "--fold", "0", "--epochs", "4", "--scan-chunk", "2"]) == 0
    results = []
    for root, _d, files in os.walk("emodb_cross_domain_results"):
        if "emodb_cross_domain_best.pth" in files:
            results.append(os.path.join(root, "emodb_cross_domain_best.pth"))
    assert results, "no DAD checkpoint produced"

    # 6. inference on the exported checkpoint
    monkeypatch.setattr(
        "robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.eval.inference.dad_preset",
        tiny_dad,
    )
    assert cli(["infer", "--weights", results[0], "--test-data",
                "features_noisy", "--split", "all"]) == 0
    out = [f for f in os.listdir("inference_results")]
    assert out


def test_fix_format_cli(tmp_path, capsys):
    import wave

    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.wavio import (
        read_wav as _read,
        write_wav as _write,
    )

    root = tmp_path / "tree"
    os.makedirs(root / "sub")
    rng = np.random.default_rng(0)
    _write(str(root / "ok.wav"), rng.normal(size=8000) * 0.1, 16000)
    # wrong rate + stereo
    _write(str(root / "sub" / "bad.wav"),
           np.stack([rng.normal(size=4410)] * 2, 1) * 0.1, 44100)

    rc = cli(["fix-format", "--root", str(root), "--check-only"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "flagged 1" in out and "bad.wav" in out

    rc = cli(["fix-format", "--root", str(root)])
    assert rc == 0
    audio, sr = _read(str(root / "sub" / "bad.wav"))
    assert sr == 16000 and audio.ndim == 1

    rc = cli(["fix-format", "--root", str(root), "--check-only"])
    assert "flagged 0" in capsys.readouterr().out


def test_sensitivity_cli(tmp_path, monkeypatch):
    from helpers import make_iemocap_dir

    monkeypatch.chdir(tmp_path)
    clean, *_ = make_iemocap_dir(tmp_path / "clean", n=48, dim=8)
    noisy, *_ = make_iemocap_dir(tmp_path / "noisy", n=48, dim=8, seed=5)
    rc = cli([
        "sensitivity", "--corpus", "iemocap",
        "--clean", clean, "--noisy", noisy,
        "--knob", "WEIGHT_ECDA", "--values", "0.0,0.3",
        "--epochs", "3", "--output-dir", str(tmp_path / "sens"),
    ])
    assert rc == 0
    results = json.load(open(tmp_path / "sens" / "sensitivity_WEIGHT_ECDA.json"))
    assert len(results) == 2
    # real sweep points, not swallowed failures
    assert all("error" not in r for r in results), results


@pytest.mark.slow
def test_ablation_multi_noise_cli(tmp_path, monkeypatch):
    """`cli ablation --multi-noise dir1,dir2` (feature mode): the
    run_granular_ablations*.py main loop through the CLI — per-experiment
    noise-condition means land in the summary JSON + markdown."""
    from helpers import make_iemocap_dir

    monkeypatch.chdir(tmp_path)
    clean, *_ = make_iemocap_dir(tmp_path / "clean", n=48, dim=8)
    n1, *_ = make_iemocap_dir(tmp_path / "root1-babble-10db", n=48, dim=8,
                              seed=5)
    n2, *_ = make_iemocap_dir(tmp_path / "root1-f16-10db", n=48, dim=8,
                              seed=6)
    out = tmp_path / "multi.json"
    rc = cli([
        "ablation", "--corpus", "iemocap",
        "--clean", clean, "--noisy", n1,
        "--suite", "granular", "--multi-noise", f"{n1},{n2}",
        "--epochs", "3", "--warmup-epochs", "1",
        "--output", str(out),
    ])
    assert rc == 0
    results = json.load(open(out))
    assert len(results) == 7  # the full GRANULAR_ABLATIONS suite
    for r in results:
        assert "error" not in r, r
        assert len(r["per_noise"]) == 2
    md = open(str(tmp_path / "multi.md")).read()
    assert "no_entropy_score" in md and "FAILED" not in md


def test_ablation_rejects_suite_noise_with_multi_noise(capsys):
    """Contradictory flags error out (argparse exit 2) instead of silently
    remapping the suite to GRANULAR_ABLATIONS."""
    with pytest.raises(SystemExit) as ei:
        cli([
            "ablation", "--corpus", "iemocap",
            "--clean", "c", "--noisy", "n",
            "--suite", "noise", "--multi-noise", "d1,d2",
        ])
    assert ei.value.code == 2
    assert "multi-noise already sweeps" in capsys.readouterr().err


def test_md_path_never_clobbers_results():
    """The markdown summary path must differ from the results JSON path
    even when --output has no .json suffix."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.exp.ablation import (
        _md_path,
    )

    assert _md_path("results.json") == "results.md"
    assert _md_path("out/grid_results") == "out/grid_results.md"
    assert _md_path("a.b/results") == "a.b/results.md"


def test_scan_chunk_defaults():
    """`dad --scan-chunk` defaults: per-step (0) everywhere except the
    explicitly host-streaming feature path (--resident off) where 4
    amortizes uploads; always per-batch under a mesh; explicit values
    honored (PERFORMANCE.md rounds 4-5 — per-step beat chunked scans on
    both resident paths)."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.cli import (
        _resolve_scan_chunk,
    )

    # feature mode: resident (the default) -> per-step; streaming -> 4
    assert _resolve_scan_chunk(None, fused=False, mesh_active=False) == 0
    assert _resolve_scan_chunk(None, fused=False, mesh_active=False,
                               resident_off=True) == 4
    assert _resolve_scan_chunk(None, fused=True, mesh_active=False) == 0
    assert _resolve_scan_chunk(8, fused=False, mesh_active=False) == 8
    assert _resolve_scan_chunk(8, fused=True, mesh_active=False) == 8
    assert _resolve_scan_chunk(0, fused=False, mesh_active=False,
                               resident_off=True) == 0
    # a mesh forces per-batch dispatch regardless of mode or flag
    assert _resolve_scan_chunk(8, fused=False, mesh_active=True) == 0
    assert _resolve_scan_chunk(None, fused=True, mesh_active=True) == 0
