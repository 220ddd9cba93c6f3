import json
import os

import jax
import numpy as np
import pytest

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.analysis import (
    analyze_confirmation_bias,
    analyze_dacp_evolution,
    analyze_disagreement,
    analyze_distribution,
    analyze_tsne,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.wavio import (
    write_wav,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
    EncoderConfig,
    dad_preset,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data import (
    load_feature_store,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.manifests import (
    build_emodb_manifest,
    parse_emodb_filename,
    read_manifest,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.eval.inference import (
    CrossDomainInference,
    detect_dataset_type,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.exp import (
    STANDARD_ABLATIONS,
    run_ablation_suite,
    run_sensitivity_sweep,
    scrape_best_results,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.convert import (
    fairseq_to_flax_encoder,
    save_torch_file,
    ssrl_to_torch_state_dict,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.extract import (
    FeatureExtractor,
    extract_manifest,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.heads import (
    init_ssrl,
)

from helpers import make_iemocap_dir
from torch_mirror import mirror_extract, rand_sd

TINY = EncoderConfig(
    embed_dim=16, depth=2, num_heads=2, prenet_depth=1,
    conv_feature_layers=((8, 4, 2), (8, 3, 2)),
    conv_pos_width=6, conv_pos_groups=2, conv_pos_depth=2,
    dtype="float32", use_flash_attention=False,
)

LM = {"ang": 0, "hap": 1, "neu": 2, "sad": 3}


def test_feature_extractor_order_and_parity(rng):
    sd = rand_sd(TINY, seed=3)
    params = fairseq_to_flax_encoder(sd, TINY)
    ex = FeatureExtractor(TINY, params, batch_size=4, buckets=(64, 128, 256))
    clips = [rng.normal(size=n).astype(np.float32) for n in (97, 45, 130, 61, 80)]
    feats = ex.extract_clips(clips)
    for clip, f in zip(clips, feats):
        ref = mirror_extract(sd, TINY, clip, normalize=True)
        assert f.shape == ref.shape
        np.testing.assert_allclose(f, ref, atol=5e-5, rtol=1e-4)


def test_extract_manifest_writes_store(tmp_path, rng):
    # tiny wav tree + manifest + emo sidecar
    wav_root = tmp_path / "wavs"
    os.makedirs(wav_root / "s")
    rels, names = [], []
    for i in range(5):
        rel = f"s/clip{i}.wav"
        write_wav(str(wav_root / rel), rng.normal(size=200 + 30 * i) * 0.1, 16000)
        rels.append(rel)
        names.append(f"Ses0{(i % 5) + 1}F_x_F{i:03d}")
    mdir = tmp_path / "manifest"
    os.makedirs(mdir)
    with open(mdir / "train.tsv", "w") as f:
        print(str(wav_root), file=f)
        for rel in rels:
            print(f"{rel}\t200", file=f)
    with open(mdir / "train.emo", "w") as f:
        for i, n in enumerate(names):
            print(f"{n}\t{['ang','hap','neu','sad'][i % 4]}", file=f)

    sd = rand_sd(TINY, seed=0)
    params = fairseq_to_flax_encoder(sd, TINY)
    out = tmp_path / "features"
    n, frames = extract_manifest(str(mdir), str(out), TINY, params, batch_size=2)
    assert n == 5
    store = load_feature_store(str(out), LM)
    assert store.validate() and store.num == 5
    assert store.dim == 16


def _fake_results_dir(tmp_path, rng):
    """Builds a results dir with history + bias log + checkpoint, as the
    trainer would leave it."""
    rd = tmp_path / "results" / "fold_1"
    for sub in ("reports", "models", "plots"):
        os.makedirs(rd / sub, exist_ok=True)
    hist = {
        "disagreement_rate_noisy": rng.uniform(0.05, 0.3, 20).tolist(),
        "dacp_ema_thresholds": rng.uniform(0.4, 0.7, (20, 4)).tolist(),
        "dacp_class_quality": rng.uniform(0.3, 0.8, (20, 4)).tolist(),
        "ecda_class_attention": rng.uniform(0.8, 1.2, (20, 4)).tolist(),
        "total_loss": rng.uniform(0.5, 2.0, 20).tolist(),
    }
    json.dump(hist, open(rd / "reports" / "training_history.json", "w"))
    log = []
    for epoch in range(10):
        for sid in range(5):
            log.append({
                "epoch": epoch, "sample_id": sid,
                "pseudo_label": int(rng.integers(0, 4)) if sid else 1,
                "certainty_score": float(rng.uniform(0.4, 0.95)),
                "is_masked_in": bool(rng.uniform() > 0.3),
            })
    json.dump(log, open(rd / "reports" / "confirmation_bias_log.json", "w"))
    return str(rd)


def test_analysis_suite(tmp_path, rng):
    rd = _fake_results_dir(tmp_path, rng)
    d = analyze_disagreement(rd, warmup_epochs=5)
    assert d["analysis_summary"]["num_validation_points_noisy"] == 20
    ns = d["noisy_domain"]
    for key in ("mean_disagreement", "std_disagreement", "max_disagreement",
                "min_disagreement", "final_disagreement", "initial_disagreement",
                "trend_slope", "trend_r_squared", "trend_p_value"):
        assert key in ns
    assert "firewall_vs_disagreement" in d["mechanism_correlations"]

    b = analyze_confirmation_bias(rd, warmup_epochs=0)
    lc = b["label_consistency"]
    assert lc["total_samples_tracked"] == 5
    assert lc["total_epochs"] == 10
    assert "mean_flip_rate" in lc and "samples_never_flipped" in lc
    assert b["confirmation_patterns"]  # certainty-bin pattern stats exist
    assert "correlation" in b["firewall_relationship"]

    e = analyze_dacp_evolution(rd)
    assert "dacp_ema_thresholds" in e

    adir = os.path.join(rd, "analysis")
    for rel in (
        "disagreement/disagreement_summary.json",
        "disagreement/disagreement_analysis_report.json",
        "disagreement/teacher_student_disagreement.png",
        "disagreement/disagreement_vs_mechanisms.png",
        "confirmation_bias/confirmation_bias_analysis_report.json",
        "confirmation_bias/pseudo_label_flip_analysis.png",
        "confirmation_bias/confirmation_bias_patterns.png",
    ):
        assert os.path.exists(os.path.join(adir, rel)), rel


def test_distribution_analysis(tmp_path, rng):
    d, *_ = make_iemocap_dir(tmp_path, n=30)
    store = load_feature_store(d, LM)
    out_dir = str(tmp_path / "a")
    out = analyze_distribution(store, ["ang", "hap", "neu", "sad"], out_dir,
                               corpus="iemocap")
    assert out["dataset_info"]["num_clips"] == 30
    assert out["overall_distribution"]["total_samples"] == 30
    assert sum(out["overall_distribution"]["counts"].values()) == 30
    assert len(out["session_distributions"]) == 5
    for g, row in out["session_distributions"].items():
        assert abs(sum(row["percentages"].values()) - 100.0) < 1e-6
    for name in (
        "overall_distribution_pie.png", "overall_distribution_bars.png",
        "session_comparison.png", "session_stacked_distribution.png",
        "detailed_statistics_table.png", "length_distribution.png",
        "iemocap_distribution_analysis_report.json", "distribution_report.txt",
    ):
        assert os.path.exists(os.path.join(out_dir, name)), name


def test_tsne_analysis(tmp_path, rng):
    d, *_ = make_iemocap_dir(tmp_path, n=40, dim=12)
    store = load_feature_store(d, LM)
    cfg = dad_preset("iemocap", input_dim=12, hidden_dim=8, batch_size=16,
                     length_buckets=(32,))
    _h, s1 = init_ssrl(jax.random.PRNGKey(0), 12, 8)
    _h, s2 = init_ssrl(jax.random.PRNGKey(1), 12, 8)
    summary = analyze_tsne(
        cfg, store, {"pretrain": s1.student, "dad": s2.student}, str(tmp_path / "t"),
        perplexity=5,
    )
    assert "pretrain" in summary and summary["pretrain"]["num_samples"] == 40


def test_inference_from_exported_checkpoint(tmp_path, rng):
    d, *_ = make_iemocap_dir(tmp_path / "feat", n=40, dim=12)
    assert detect_dataset_type(d) == "iemocap"
    _h, ssrl = init_ssrl(jax.random.PRNGKey(0), 12, 8)
    wpath = str(tmp_path / "best.pth")
    save_torch_file(ssrl_to_torch_state_dict(ssrl), wpath)
    cfg = dad_preset("iemocap", input_dim=12, hidden_dim=8, batch_size=16,
                     length_buckets=(32,))
    inf = CrossDomainInference(wpath, d, str(tmp_path / "out"), cfg=cfg, fold=0)
    res = inf.run_inference("all")
    assert res["info"]["num_samples"] == 40
    assert 0 <= res["metrics"]["weighted_accuracy"] <= 100
    assert os.path.exists(os.path.join(inf.output_dir, "inference_results.json"))


def test_emodb_manifest(tmp_path, rng):
    root = tmp_path / "emodb"
    os.makedirs(root)
    # 03a01Fa -> F not in 4-class map (Freude is not mapped!) use coded letters
    names = ["03a01Aa.wav", "08b02Tb.wav", "09a03Lc.wav", "10b01Na.wav", "03a02Xa.wav"]
    for n in names:
        write_wav(str(root / n), rng.normal(size=400) * 0.1, 16000)
    entries = build_emodb_manifest(str(root), str(tmp_path / "m"))
    assert len(entries) == 4  # X filtered out
    assert entries[0].speaker == "emodb_spk_03"
    assert parse_emodb_filename("03a01Aa.wav")[3] == "angry"
    root_line, files = read_manifest(str(tmp_path / "m"))
    assert len(files) == 4


@pytest.mark.slow
def test_ablation_and_sensitivity(tmp_path, monkeypatch, rng):
    monkeypatch.chdir(tmp_path)
    from helpers import make_iemocap_dir as mk

    cd, *_ = mk(tmp_path / "clean", n=60, dim=12, seed=0)
    nd, *_ = mk(tmp_path / "noisy", n=60, dim=12, seed=0)
    clean = load_feature_store(cd, LM)
    noisy = load_feature_store(nd, LM)
    cfg = dad_preset(
        "iemocap", input_dim=12, hidden_dim=8, batch_size=16, epochs=2,
        warmup_epochs=1, ecda_start_epoch=1, validation_interval=1,
        noisy_data_dir="x/root1-babble-10db", length_buckets=(32,),
    )
    suite = {"full_method": {}, "no_dacp": {"USE_DACP": False}}
    results = run_ablation_suite(
        cfg, suite, fold=0, output_path=str(tmp_path / "abl.json"),
        clean_store=clean, noisy_store=noisy,
    )
    assert len(results) == 2
    assert all("noisy_wa" in r for r in results)
    assert os.path.exists(tmp_path / "abl.md")
    md = open(tmp_path / "abl.md").read()
    assert "full_method" in md and "no_dacp" in md

    sens = run_sensitivity_sweep(
        cfg, "WEIGHT_ECDA", values=[0.0, 0.3], fold=0,
        output_dir=str(tmp_path / "sens"),
        clean_store=clean, noisy_store=noisy,
    )
    assert len(sens) == 2
    assert os.path.exists(tmp_path / "sens" / "sensitivity_WEIGHT_ECDA.json")


def test_standard_ablations_defined():
    assert "full_method" in STANDARD_ABLATIONS
    assert STANDARD_ABLATIONS["no_dacp"] == {"USE_DACP": False}


def test_fix_manifest_paths(tmp_path, rng):
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.manifests import (
        fix_manifest_paths,
    )

    old_root = tmp_path / "old"
    new_root = tmp_path / "new"
    os.makedirs(new_root / "spk1")
    # wav moved from flat layout into spk1/ subdir
    write_wav(str(new_root / "spk1" / "a.wav"), rng.normal(size=100) * 0.1, 16000)
    mdir = tmp_path / "m"
    os.makedirs(mdir)
    with open(mdir / "train.tsv", "w") as f:
        print(str(old_root), file=f)
        print("a.wav\t100", file=f)
        print("gone.wav\t50", file=f)
    kept = fix_manifest_paths(str(mdir), str(new_root))
    assert kept == 1
    root, files = read_manifest(str(mdir))
    assert root == str(new_root)
    assert files[0][0] == "spk1/a.wav"


def test_pretrain_variants():
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
        pretrain_preset,
    )

    adv = pretrain_preset("iemocap", variant="advanced")
    assert adv.batch_size == 128 and adv.lr_scheduler_type == "CosineAnnealingWarmRestarts"
    cos = pretrain_preset("iemocap", variant="cosine")
    assert cos.max_epochs == 120
    dbg = pretrain_preset("emodb", variant="debug")
    assert dbg.max_epochs == 10 and dbg.batch_size == 32


def test_iemocap_manifest_and_evaluation_parsing(tmp_path, rng):
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.manifests import (
        build_iemocap_manifest,
        parse_iemocap_emo_evaluation,
    )

    # EmoEvaluation file in the IEMOCAP format
    ev = tmp_path / "EmoEvaluation"
    os.makedirs(ev)
    (ev / "Ses01F_impro01.txt").write_text(
        "% header\n"
        "[6.2901 - 8.2357]\tSes01F_impro01_F000\tneu\t[2.5, 2.5, 2.5]\n"
        "[10.01 - 11.37]\tSes01F_impro01_F001\texc\t[3.5, 3.0, 3.0]\n"
        "[14.00 - 15.00]\tSes01F_impro01_M000\tfru\t[2.0, 3.5, 3.5]\n"
        "[16.00 - 17.00]\tSes01F_impro01_M001\tang\t[1.5, 3.5, 3.5]\n"
    )
    labels = parse_iemocap_emo_evaluation(str(ev))
    assert labels == {
        "Ses01F_impro01_F000": "neu",
        "Ses01F_impro01_F001": "hap",  # exc folded into hap
        "Ses01F_impro01_M001": "ang",
    }  # fru filtered out

    # wav tree Session1/sentences/wav/<folder>/<utt>.wav
    root = tmp_path / "IEMOCAP"
    wdir = root / "Session1" / "sentences" / "wav" / "Ses01F_impro01"
    os.makedirs(wdir)
    for utt in labels:
        write_wav(str(wdir / f"{utt}.wav"), rng.normal(size=320) * 0.1, 16000)
    entries = build_iemocap_manifest(str(root), str(tmp_path / "mani"), labels=labels)
    assert len(entries) == 3
    assert all(e.frames == 320 for e in entries)
    with open(tmp_path / "mani" / "train.emo") as f:
        emo_lines = f.read().strip().split("\n")
    assert any("Ses01F_impro01_F001\thap" in ln for ln in emo_lines)


def test_casia_manifest(tmp_path, rng):
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.manifests import (
        build_casia_manifest,
    )

    root = tmp_path / "CASIA"
    # two alias spellings of the same speaker set; 'normal' maps to neutral
    for spk, emo in [("liuchanhg", "angry"), ("Chang.Liu", "normal"),
                     ("wangzhe", "happy"), ("ZhaoZuoxiang", "sad"),
                     ("ignored_spk", "angry")]:
        d = root / spk / emo
        os.makedirs(d, exist_ok=True)
        write_wav(str(d / "201.wav"), rng.normal(size=160) * 0.1, 16000)
    entries = build_casia_manifest(str(root), str(tmp_path / "m"))
    assert len(entries) == 4  # unknown speaker dropped
    by_spk = {e.speaker for e in entries}
    assert by_spk == {"casia_spk_1", "casia_spk_2", "casia_spk_4"}
    labels = sorted(e.label for e in entries)
    assert labels == ["angry", "happy", "neutral", "sad"]


def test_noise_grid_preprocess(tmp_path, rng):
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.exp import (
        run_noise_grid,
    )

    clean_root = tmp_path / "wavs"
    os.makedirs(clean_root / "s")
    rels = ["s/a.wav", "s/b.wav"]
    for i, rel in enumerate(rels):
        t = np.arange(4000) / 16000
        write_wav(str(clean_root / rel), 0.3 * np.sin(2 * np.pi * (300 + i * 50) * t), 16000)
    mdir = tmp_path / "m"
    os.makedirs(mdir)
    with open(mdir / "train.tsv", "w") as f:
        print(str(clean_root), file=f)
        for rel in rels:
            print(f"{rel}\t4000", file=f)
    out = run_noise_grid(
        str(mdir), str(clean_root), str(tmp_path / "noisy"), snrs=[10, 20],
    )
    assert [r["name"] for r in out] == ["root1-white-10db", "root1-white-20db"]
    for r in out:
        for rel in rels:
            assert os.path.exists(os.path.join(r["wav_dir"], rel))


def test_paired_gamma_delta_sweep(tmp_path, monkeypatch, rng):
    monkeypatch.chdir(tmp_path)
    from helpers import make_iemocap_dir as mk

    cd, *_ = mk(tmp_path / "c2", n=40, dim=12, seed=0)
    nd, *_ = mk(tmp_path / "n2", n=40, dim=12, seed=0)
    clean = load_feature_store(cd, LM)
    noisy = load_feature_store(nd, LM)
    cfg = dad_preset(
        "iemocap", input_dim=12, hidden_dim=8, batch_size=16, epochs=2,
        warmup_epochs=1, ecda_start_epoch=1, validation_interval=1,
        noisy_data_dir="x/root1-babble-10db", length_buckets=(32,),
    )
    res = run_sensitivity_sweep(
        cfg, "ECDA_GAMMA_DELTA", values=[0.1], fold=0,
        output_dir=str(tmp_path / "s2"), clean_store=clean, noisy_store=noisy,
    )
    assert res[0]["overrides"]["ECDA_COMPACTNESS_WEIGHT_GAMMA"] == 0.1
    assert res[0]["overrides"]["ECDA_REPULSION_WEIGHT_DELTA"] == 0.1


def test_noise_condition_experiments_grid():
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.exp.ablation import (
        noise_condition_experiments,
    )

    grid = noise_condition_experiments("/data/noisy")
    assert len(grid) == 16  # 4 types x 4 SNRs
    assert grid["babble_0db"]["NOISY_DATA_DIR"].replace("\\", "/").endswith(
        "root1-babble-0db"
    )


def test_classification_report_text_structure(rng):
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.eval.metrics import (
        classification_report_text,
    )

    y = rng.integers(0, 4, 60)
    p = rng.integers(0, 4, 60)
    txt = classification_report_text(y, p, ["ang", "hap", "neu", "sad"])
    assert "weighted avg" in txt and "macro avg" in txt
    assert "ang" in txt and "precision" in txt


def test_inference_teacher_network(tmp_path, rng):
    d, *_ = make_iemocap_dir(tmp_path / "f", n=24, dim=12)
    _h, ssrl = init_ssrl(jax.random.PRNGKey(3), 12, 8)
    # make teacher differ from student so the switch is observable
    import jax as _jax

    ssrl = ssrl._replace(
        teacher=_jax.tree.map(lambda x: x + 0.5, ssrl.teacher)
    )
    wpath = str(tmp_path / "w.pth")
    save_torch_file(ssrl_to_torch_state_dict(ssrl), wpath)
    cfg = dad_preset("iemocap", input_dim=12, hidden_dim=8, batch_size=8,
                     length_buckets=(32,))
    inf_s = CrossDomainInference(wpath, d, str(tmp_path / "o1"), cfg=cfg)
    inf_t = CrossDomainInference(wpath, d, str(tmp_path / "o2"), cfg=cfg,
                                 use_teacher=True)
    rs = inf_s.run_inference("all")
    rt = inf_t.run_inference("all")
    assert rs["info"]["network"] == "student"
    assert rt["info"]["network"] == "teacher"
    # different params -> (almost surely) different confidences
    assert rs["confidence_stats"]["mean"] != rt["confidence_stats"]["mean"]


def test_run_cv_survives_fold_failure(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train import (
        run_cv,
    )
    from helpers import make_iemocap_dir as mk

    cd, *_ = mk(tmp_path / "c", n=50, dim=12)
    nd, *_ = mk(tmp_path / "n", n=50, dim=12, seed=1)
    clean = load_feature_store(cd, LM)
    noisy = load_feature_store(nd, LM)
    cfg = dad_preset(
        "iemocap", input_dim=12, hidden_dim=8, batch_size=16, epochs=1,
        warmup_epochs=1, validation_interval=1,
        noisy_data_dir="x/root1-babble-10db", length_buckets=(32,),
    )
    # fold 99 raises inside the sweep; the sweep must continue
    summary = run_cv(cfg, folds=[99, 0], clean_store=clean, noisy_store=noisy)
    assert "error" in summary["folds"][0]
    assert "error" not in summary["folds"][1]


def test_inference_speaker_fold_split(tmp_path, rng):
    """--split test on a CASIA-style store: 4 unique speakers -> casia fold
    policy; only fold-0's test speaker is evaluated."""
    from helpers import make_spk_dir

    spks = [f"casia_spk_{i}" for i in range(1, 5)]
    d, *_ = make_spk_dir(tmp_path / "cf", spks, n_per_spk=6, dim=12)
    _h, ssrl = init_ssrl(jax.random.PRNGKey(0), 12, 8)
    wpath = str(tmp_path / "w.pth")
    save_torch_file(ssrl_to_torch_state_dict(ssrl), wpath)
    cfg = dad_preset("casia", input_dim=12, hidden_dim=8, batch_size=8,
                     length_buckets=(32,))
    inf = CrossDomainInference(wpath, d, str(tmp_path / "o"), cfg=cfg, fold=0)
    assert inf.ds_type == "speaker"
    res = inf.run_inference("test")
    assert res["info"]["num_samples"] == 6  # one test speaker's clips


def test_preprocess_root2(tmp_path, rng):
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.exp import (
        run_noise_grid,
    )

    clean_root = tmp_path / "w"
    os.makedirs(clean_root)
    t = np.arange(4000) / 16000
    write_wav(str(clean_root / "a.wav"), 0.3 * np.sin(2 * np.pi * 440 * t), 16000)
    noise_root = tmp_path / "5types"
    os.makedirs(noise_root)
    for fname in ["babble.wav", "f16.wav", "factory1.wav", "hfchannel.wav", "volvo.wav"]:
        write_wav(str(noise_root / fname), rng.normal(size=2000) * 0.1, 16000)
    mdir = tmp_path / "m"
    os.makedirs(mdir)
    with open(mdir / "train.tsv", "w") as f:
        print(str(clean_root), file=f)
        print("a.wav\t4000", file=f)
    out = run_noise_grid(str(mdir), str(clean_root), str(tmp_path / "nz"),
                         snrs=[15], noise_root=str(noise_root), root2=True)
    assert out[0]["name"] == "root2-15db"
    assert os.path.exists(os.path.join(out[0]["wav_dir"], "a.wav"))


def test_profiler_trace_smoke(tmp_path):
    import jax
    import jax.numpy as jnp

    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.utils.profiling import (
        trace,
    )

    with trace(str(tmp_path / "tr")):
        _ = jax.jit(lambda x: x * 2)(jnp.ones(8)).block_until_ready()
    import glob

    assert glob.glob(str(tmp_path / "tr" / "**" / "*.xplane.pb"), recursive=True)


@pytest.mark.slow
def test_noise_grid_preprocess_with_extraction(tmp_path, rng):
    """The checkpoint branch of run_noise_grid: the encoder loads ONCE for
    the whole grid, each condition gets a features-{name} store readable by
    load_feature_store, and encoder_cfg overrides the default full-size
    config (so non-default checkpoints work through `cli preprocess
    --encoder-json`)."""
    import torch

    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.exp import (
        run_noise_grid,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models import (
        convert as mc,
    )

    clean_root = tmp_path / "wavs"
    os.makedirs(clean_root / "s")
    rels, names = [], []
    for i in range(4):
        rel = f"s/clip{i}.wav"
        write_wav(str(clean_root / rel), rng.normal(size=3000) * 0.1, 16000)
        rels.append(rel)
        names.append(f"Ses0{(i % 5) + 1}F_x_F{i:03d}")
    mdir = tmp_path / "m"
    os.makedirs(mdir)
    with open(mdir / "train.tsv", "w") as f:
        print(str(clean_root), file=f)
        for rel in rels:
            print(f"{rel}\t3000", file=f)
    with open(mdir / "train.emo", "w") as f:
        for i, n in enumerate(names):
            print(f"{n}\t{['ang', 'hap', 'neu', 'sad'][i]}", file=f)

    ckpt = tmp_path / "tiny.pt"
    torch.save({"model": rand_sd(TINY, seed=0)}, str(ckpt))

    calls = {"n": 0}
    real = mc.load_emotion2vec_checkpoint

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    import robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.exp.preprocess as pp

    out = None
    try:
        # patch at the loader's definition site (preprocess imports lazily)
        mc.load_emotion2vec_checkpoint = counting
        out = run_noise_grid(
            str(mdir), str(clean_root), str(tmp_path / "noisy"),
            snrs=[10, 20], checkpoint=str(ckpt), encoder_cfg=TINY,
        )
    finally:
        mc.load_emotion2vec_checkpoint = real
    assert calls["n"] == 1  # one ckpt load for the whole grid
    assert [r["name"] for r in out] == ["root1-white-10db", "root1-white-20db"]
    for r in out:
        assert r["feature_dir"] is not None
        store = load_feature_store(r["feature_dir"], LM)
        assert store.validate() and store.num == 4
        assert store.dim == 16  # encoder_cfg respected, not the 768 default


@pytest.mark.slow
def test_multi_noise_suite(tmp_path, monkeypatch, rng):
    """run_multi_noise_suite (the run_granular_ablations*.py main loop):
    every mechanism averaged over NOISY_DATA_DIR conditions, summary JSON +
    markdown written."""
    monkeypatch.chdir(tmp_path)
    from helpers import make_iemocap_dir as mk
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.exp import (
        run_multi_noise_suite,
    )

    cd, *_ = mk(tmp_path / "clean", n=60, dim=12, seed=0)
    n1, *_ = mk(tmp_path / "root1-babble-10db", n=60, dim=12, seed=1)
    n2, *_ = mk(tmp_path / "root1-f16-10db", n=60, dim=12, seed=2)
    clean = load_feature_store(cd, LM)
    cfg = dad_preset(
        "iemocap", input_dim=12, hidden_dim=8, batch_size=16, epochs=2,
        warmup_epochs=1, ecda_start_epoch=1, validation_interval=1,
        clean_data_dir=cd, noisy_data_dir=n1, length_buckets=(32,),
    )
    suite = {"full_method": {}, "no_entropy_score": {"USE_ENTROPY_IN_SCORE": False}}
    out = str(tmp_path / "multi.json")
    results = run_multi_noise_suite(
        cfg, suite, [n1, n2], fold=0, output_path=out, clean_store=clean,
    )
    assert [r["name"] for r in results] == list(suite)
    for r in results:
        assert "error" not in r, r
        assert len(r["per_noise"]) == 2
        assert r["mean_noisy_wa"] is not None
        # the mean really is the mean of the per-condition values
        per = [v["noisy_wa"] for v in r["per_noise"].values()]
        np.testing.assert_allclose(r["mean_noisy_wa"], np.mean(per))
    assert os.path.exists(out)
    md = open(str(tmp_path / "multi.md")).read()
    assert "no_entropy_score" in md and "FAILED" not in md


def test_mechanism_correlation_alignment(tmp_path):
    """Disagreement point i pairs with threshold row i (both are recorded
    once per post-warmup epoch): a perfectly correlated pair of series must
    come out with r ~ 1, which interval-quantized alignment destroys."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.analysis.disagreement import (
        mechanisms_correlation,
    )

    n = 20
    thr = [[0.4 + 0.01 * i] * 4 for i in range(n)]
    noisy = np.array([0.3 - 0.01 * i for i in range(n)])
    out = mechanisms_correlation(
        noisy, {"dacp_ema_thresholds": thr}, warmup=5, interval=5
    )
    assert out["epochs_aligned"] == n
    r = out["mean_threshold_vs_disagreement"]["r"]
    np.testing.assert_allclose(r, -1.0, atol=1e-9)
    np.testing.assert_allclose(out["_aligned"]["mean_thr"],
                               [0.4 + 0.01 * i for i in range(n)])
    assert out["_aligned"]["epochs"] == [6 + i for i in range(n)]
