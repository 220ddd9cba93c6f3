import json
import os

import numpy as np

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
    dad_preset,
    pretrain_preset,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data import (
    load_feature_store,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train import (
    CrossDomainTrainer,
    extract_noise_info,
    train_with_early_stopping,
)

from helpers import make_iemocap_dir

LM = {"ang": 0, "hap": 1, "neu": 2, "sad": 3}


def _stores(tmp_path, n=80, dim=12):
    clean_dir, *_ = make_iemocap_dir(tmp_path / "clean", n=n, dim=dim, seed=0)
    noisy_dir, *_ = make_iemocap_dir(tmp_path / "noisy", n=n, dim=dim, seed=0)
    clean = load_feature_store(clean_dir, LM)
    noisy = load_feature_store(noisy_dir, LM)
    # make features class-separable so training does something
    for store in (clean, noisy):
        for i in range(store.num):
            o, s = int(store.offsets[i]), int(store.sizes[i])
            store.feats[o : o + s] += store.labels[i] * 0.8
    noisy.feats += np.random.default_rng(1).normal(0, 0.3, noisy.feats.shape).astype(
        np.float32
    )
    return clean, noisy


def test_noise_info_parsing():
    assert extract_noise_info(r"C:\x\root1-babble-0db")["display_name"] == "root1-babble-0db"
    assert extract_noise_info("/d/root1-f16.wav-20db")["noise_type"] == "f16"
    info = extract_noise_info("/d/root2-15db")
    assert info["root_type"] == "root2" and info["db_value"] == "15db"
    assert extract_noise_info("/d/whatever")["root_type"] == "unknown"


def test_pretrain_e2e(tmp_path):
    clean, _ = _stores(tmp_path, n=80, dim=12)
    cfg = pretrain_preset(
        "iemocap",
        input_dim=12,
        hidden_dim=8,
        max_epochs=4,
        batch_size=16,
        save_dir=str(tmp_path / "models"),
        length_buckets=(32,),
        early_stopping_patience=10,
    )
    summary = train_with_early_stopping(cfg, store=clean, folds=(0,))
    assert 0.0 <= summary["mean_test_accuracy"] <= 1.0
    save_dir = str(tmp_path / "models")
    assert os.path.exists(os.path.join(save_dir, "best_model_fold_1.ckpt"))
    assert os.path.exists(os.path.join(save_dir, "test_results.json"))
    assert os.path.exists(os.path.join(save_dir, "training_history.json"))
    hist = json.load(open(os.path.join(save_dir, "training_history.json")))
    assert len(hist["fold_1"]["train_loss"]) == 4

    # the exported ckpt is loadable as a torch-layout state dict
    import torch

    sd = torch.load(os.path.join(save_dir, "best_model_fold_1.ckpt"), weights_only=False)
    assert sd["pre_net.weight"].shape == (8, 12)
    assert sd["post_net.weight"].shape == (4, 8)


def test_dad_e2e(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    clean, noisy = _stores(tmp_path, n=80, dim=12)
    cfg = dad_preset(
        "iemocap",
        input_dim=12,
        hidden_dim=8,
        batch_size=16,
        epochs=4,
        warmup_epochs=1,
        ecda_start_epoch=1,
        weight_ramp_epochs=2,
        validation_interval=1,
        noisy_data_dir="data/root1-babble-10db",
        length_buckets=(32,),
        num_tracked_samples=10,
    )
    trainer = CrossDomainTrainer(cfg, fold=0, clean_store=clean, noisy_store=noisy)
    result = trainer.train()
    rd = result["results_dir"]
    assert "root1/babble/10db/fold_1" in rd.replace("\\", "/")
    # artifact checklist (the reference's report contract)
    reports = os.listdir(os.path.join(rd, "reports"))
    assert any(f.startswith("BEST_detailed_results_epoch_") for f in reports)
    assert "FINAL_test_set_results.json" in reports
    assert "training_history.json" in reports
    assert "confirmation_bias_log.json" in reports
    models = os.listdir(os.path.join(rd, "models"))
    assert "iemocap_cross_domain_best.pth" in models

    hist = json.load(
        open(os.path.join(rd, "reports", "training_history.json"))
    )
    assert "dacp_ema_thresholds" in hist and len(hist["dacp_ema_thresholds"]) == 3
    assert "ecda_class_attention" in hist
    assert "disagreement_rate_noisy" in hist
    assert len(hist["total_loss"]) == 4

    bias = json.load(open(os.path.join(rd, "reports", "confirmation_bias_log.json")))
    assert {"epoch", "sample_id", "pseudo_label", "certainty_score", "is_masked_in"} <= set(
        bias[0].keys()
    )

    final = json.load(open(os.path.join(rd, "reports", "FINAL_test_set_results.json")))
    assert final["final_test_results"]["noisy_domain"]["weighted_accuracy"].endswith("%")

    # exported best checkpoint loads in the reference torch layout
    import torch

    sd = torch.load(os.path.join(rd, "models", "iemocap_cross_domain_best.pth"),
                    weights_only=False)
    assert "student_encoder.pre_net.weight" in sd
    assert "teacher_classifier.fc_layer.bias" in sd


def test_run_cv_sweep(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train import (
        run_cv,
    )

    clean, noisy = _stores(tmp_path, n=80, dim=12)
    cfg = dad_preset(
        "iemocap", input_dim=12, hidden_dim=8, batch_size=16, epochs=2,
        warmup_epochs=1, ecda_start_epoch=1, validation_interval=1,
        noisy_data_dir="data/root1-babble-10db", length_buckets=(32,),
    )
    summary = run_cv(cfg, folds=[0, 1], clean_store=clean, noisy_store=noisy,
                     scan_chunk=4)
    assert len(summary["folds"]) == 2
    assert summary["mean_noisy_weighted_acc"] is not None
    assert os.path.exists(
        os.path.join(cfg.results_base_dir, "final_summary_report.json")
    )


def test_dad_casia_and_emodb_presets(tmp_path, monkeypatch):
    """CASIA runs the fixed-threshold (USE_DACP/ECDA off) path; EMODB runs
    10-fold LOSO with its own beta/lr — exercises preset plumbing + speaker
    folds end to end."""
    from helpers import make_spk_dir

    monkeypatch.chdir(tmp_path)
    LMG = {"angry": 0, "happy": 1, "neutral": 2, "sad": 3}

    # CASIA: 4 speakers
    spks = [f"casia_spk_{i}" for i in range(1, 5)]
    cd, *_ = make_spk_dir(tmp_path / "cc", spks, n_per_spk=12, dim=12)
    nd, *_ = make_spk_dir(tmp_path / "cn", spks, n_per_spk=12, dim=12, seed=1)
    cfg = dad_preset(
        "casia", input_dim=12, hidden_dim=8, batch_size=16, epochs=2,
        warmup_epochs=1, ecda_start_epoch=1, validation_interval=1,
        noisy_data_dir="x/root1-babble-10db", length_buckets=(32,),
    )
    assert not cfg.dacp.use_dacp  # committed CASIA config ships DACP off
    t = CrossDomainTrainer(cfg, fold=0,
                           clean_store=load_feature_store(cd, LMG),
                           noisy_store=load_feature_store(nd, LMG))
    t.train(checkpoint_interval=0)
    assert os.path.exists(
        os.path.join(t.results_dir, "models", "casia_cross_domain_best.pth")
    )
    # fixed-threshold path: DACP state untouched
    assert np.allclose(np.asarray(t.state.dacp.ema_thresholds), 0.5)

    # EMODB: 10 speakers LOSO
    espk = [f"emodb_spk_{s}" for s in
            ["03", "08", "09", "10", "11", "12", "13", "14", "15", "16"]]
    ed, *_ = make_spk_dir(tmp_path / "ec", espk, n_per_spk=6, dim=12)
    en, *_ = make_spk_dir(tmp_path / "en", espk, n_per_spk=6, dim=12, seed=2)
    ecfg = dad_preset(
        "emodb", input_dim=12, hidden_dim=8, batch_size=16, epochs=2,
        warmup_epochs=1, ecda_start_epoch=1, validation_interval=1,
        noisy_data_dir="y/root2-15db", length_buckets=(32,),
    )
    assert ecfg.dacp.quality_smoothing_beta == 0.8
    te = CrossDomainTrainer(ecfg, fold=3,
                            clean_store=load_feature_store(ed, LMG),
                            noisy_store=load_feature_store(en, LMG))
    te.train(checkpoint_interval=0)
    assert "root2/15db/fold_4" in te.results_dir.replace("\\", "/")
    # LOSO isolation: fold 3 test speaker ('10') and val speaker ('11') are
    # absent from the train split
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data import (
        corpus_fold_split,
    )

    store = load_feature_store(ed, LMG)
    tr, va, tst = corpus_fold_split("emodb", 3, store.groups)
    tr_spk = {str(store.groups[i])[-2:] for i in tr}
    assert "10" not in tr_spk and "11" not in tr_spk
    assert {str(store.groups[i])[-2:] for i in tst} == {"10"}


def test_clean_noisy_train_shuffles_are_independent(tmp_path, monkeypatch):
    # the clean and noisy stores list the same utterances in the same order;
    # a shared shuffle stream would pair every clean batch with its own
    # noise-added twin (reference loaders shuffle independently,
    # train.py:479-483)
    monkeypatch.chdir(tmp_path)
    clean, noisy = _stores(tmp_path, n=80, dim=12)
    cfg = dad_preset("iemocap", input_dim=12, hidden_dim=8, batch_size=16,
                     epochs=2, length_buckets=(32,))
    trainer = CrossDomainTrainer(cfg, fold=0, clean_store=clean,
                                 noisy_store=noisy)
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.batching import (
        paired_epoch,
    )

    aligned = total = 0
    for cb, nb in paired_epoch(trainer.clean_train, trainer.noisy_train, 0):
        aligned += int(np.array_equal(np.asarray(cb.ids), np.asarray(nb.ids)))
        total += 1
    assert total > 1
    assert aligned < total, "clean/noisy batches are identically ordered"


def test_max_frames_caps_valid_frames_exactly(tmp_path):
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.batching import (
        PaddedBatchIterator,
    )

    clean, _ = _stores(tmp_path, n=16, dim=12)
    # clips are up to 24 frames; cap at 10 with a 32-bucket so bucket
    # rounding exceeds the cap
    it = PaddedBatchIterator(clean, 8, (32,), shuffle=False, max_frames=10)
    for b in it:
        valid = ~np.asarray(b.padding_mask)
        assert valid.sum(axis=1).max() <= 10
        assert np.all(np.asarray(b.feats)[:, 10:] == 0.0)


def test_final_eval_skipped_without_best_checkpoint(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    clean, noisy = _stores(tmp_path, n=80, dim=12)
    cfg = dad_preset("iemocap", input_dim=12, hidden_dim=8, batch_size=16,
                     epochs=2, length_buckets=(32,))
    trainer = CrossDomainTrainer(cfg, fold=0, clean_store=clean,
                                 noisy_store=noisy)
    # no training ran, no best checkpoint: must skip, not evaluate
    # last-epoch weights as a "best-model" result (reference train.py:704-707)
    assert trainer._evaluate_on_test_set() is None
    assert not os.path.exists(
        os.path.join(trainer.results_dir, "reports",
                     "FINAL_test_set_results.json")
    )


def test_resume_preserves_training_history(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    clean, noisy = _stores(tmp_path, n=80, dim=12)

    def mk():
        cfg = dad_preset(
            "iemocap", input_dim=12, hidden_dim=8, batch_size=16, epochs=4,
            warmup_epochs=1, ecda_start_epoch=1, weight_ramp_epochs=2,
            validation_interval=1, length_buckets=(32,),
            num_tracked_samples=10,
        )
        return CrossDomainTrainer(cfg, fold=0, clean_store=clean,
                                  noisy_store=noisy)

    t1 = mk()
    t1.train(checkpoint_interval=1)
    full_hist = json.load(open(os.path.join(
        t1.results_dir, "reports", "training_history.json")))
    n_epochs_full = len(full_hist["total_loss"])

    # fresh trainer resuming from the final checkpoint must carry the whole
    # history forward (not just post-resume epochs)
    t2 = mk()
    start = t2.try_resume()
    assert start > 0
    assert len(t2.training_history["total_loss"]) == n_epochs_full
    assert t2.bias_analysis_log  # bias log carried too
