"""E2E tests for the fused wav->train mode (train/fused_trainer.py):
synthetic EMODB-style tone corpus, tiny encoder, full trainer loop on the
8-device virtual CPU mesh — reports must match the feature-level trainer's
schema, and the dp-sharded run must reproduce the single-device run."""

import json
import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
    EncoderConfig,
    dad_preset,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.manifests import (
    build_emodb_manifest,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.wavstore import (
    PaddedWavIterator,
    load_wav_store,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.emotion2vec import (
    Emotion2vecEncoder,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.parallel.fused import (
    FusedConfig,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.fused_trainer import (
    FusedCrossDomainTrainer,
    injection_display_name,
)

TINY_ENC = EncoderConfig(
    embed_dim=16, depth=2, num_heads=2, prenet_depth=1,
    conv_feature_layers=((8, 4, 2), (8, 3, 2)),
    conv_pos_width=6, conv_pos_groups=2, conv_pos_depth=2,
    dtype="float32", use_flash_attention=False,
    # keep class-coded amplitudes visible to the random untrained encoder
    # (whole-clip normalization would erase them)
    normalize_input=False,
)

SPK = ["03", "08", "09", "10", "11", "12", "13", "14", "15", "16"]
# letter codes per class index, matching the reference's EMODB_EMOTION_MAP
# quirk (manifests.py:46: A=angry, T=happy, N=neutral, L=sad)
CODES = "ATNL"


def make_corpus(tmp_path, clips_per_spk=8, sr=16000):
    """EMODB-named tone corpus: class-dependent frequencies, separable."""
    root = os.path.join(str(tmp_path), "wav")
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.wavio import (
        write_wav,
    )

    for spk in SPK:
        for j in range(clips_per_spk):
            c = j % 4
            # class-dependent frequency AND amplitude: amplitude survives
            # mean pooling through a random untrained encoder, keeping the
            # task learnable in a handful of epochs
            f = 200.0 * (c + 1) + rng.normal() * 3
            amp = 0.08 + 0.12 * c
            n = int(sr * (0.25 + 0.2 * rng.random()))
            t = np.arange(n) / sr
            wav = amp * np.sin(2 * np.pi * f * t) + 0.01 * rng.normal(size=n)
            write_wav(os.path.join(root, f"{spk}a{j % 7}{CODES[c]}a.wav"),
                      wav.astype(np.float32), sr)
    dest = os.path.join(str(tmp_path), "manifests")
    entries = build_emodb_manifest(root, dest)
    assert len(entries) == 10 * clips_per_spk
    return dest


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return make_corpus(tmp_path_factory.mktemp("fusedtrain"))


def tiny_enc_params():
    enc = Emotion2vecEncoder(TINY_ENC)
    return enc.init(jax.random.PRNGKey(0), np.zeros((1, 8000), np.float32),
                    np.ones((1, 8000), bool))


def _dad_cfg(tmp_path, **kw):
    base = dict(
        batch_size=8, epochs=5, warmup_epochs=1, ecda_start_epoch=1,
        weight_ramp_epochs=2, validation_interval=1, hidden_dim=8,
        results_base_dir=os.path.join(str(tmp_path), "results"),
    )
    base.update(kw)
    return dad_preset("emodb", **base)


def test_wav_store_and_iterator(corpus):
    cfg = _dad_cfg("/tmp")
    store = load_wav_store(corpus, cfg.label_map)
    assert store.num == 80 and store.labels is not None
    assert store.groups is not None and len(np.unique(store.groups)) == 10
    it = PaddedWavIterator(store, 8, buckets=(8000, 16000), shuffle=True,
                          seed=3)
    batches = list(it)
    assert sum(int(b.row_valid.sum()) for b in batches) == 80
    for b in batches:
        assert b.wav.shape[1] in (8000, 16000)
        # padded samples are zero and masked
        assert np.all(b.wav[b.wav_mask] == 0)
    # shuffles differ per epoch, same seed restartable
    it.set_epoch(0)
    ids0 = np.concatenate([b.ids for b in it])
    it.set_epoch(1)
    ids1 = np.concatenate([b.ids for b in it])
    it.set_epoch(0)
    ids0b = np.concatenate([b.ids for b in it])
    assert not np.array_equal(ids0, ids1)
    np.testing.assert_array_equal(ids0, ids0b)


def test_injection_display_names():
    cfg = dad_preset("emodb")
    enc = TINY_ENC
    assert injection_display_name(
        FusedConfig(encoder=enc, dad=cfg, inject_snr_db=10.0)
    ).endswith("root1-white-10db")
    assert injection_display_name(
        FusedConfig(encoder=enc, dad=cfg, inject_snr_db=15.0,
                    inject_noise_bank_mode="fixed", inject_noise_type=1)
    ).endswith("root1-f16-15db")
    assert injection_display_name(
        FusedConfig(encoder=enc, dad=cfg, inject_snr_db=5.0,
                    inject_noise_bank_mode="random")
    ).endswith("root2-5db")
    # multi-SNR keeps its whole SNR set AND the bank mode, and round-trips
    # through extract_noise_info (so two multi configs never collapse into
    # one 'unknown' results dir)
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.dad_trainer import (
        extract_noise_info,
    )

    multi_white = injection_display_name(
        FusedConfig(encoder=enc, dad=cfg, inject_snr_db=None,
                    inject_snr_choices=(20.0, 10.0))
    )
    assert multi_white.endswith("root1-white-multi_20_10db")
    info = extract_noise_info(multi_white)
    assert (info["root_type"], info["noise_type"]) == ("root1", "white")
    assert info["db_value"] == "multi_20_10db"
    multi_bank = injection_display_name(
        FusedConfig(encoder=enc, dad=cfg, inject_snr_db=None,
                    inject_snr_choices=(20.0, 10.0),
                    inject_noise_bank_mode="random")
    )
    assert multi_bank.endswith("root2-multi_20_10db")
    assert extract_noise_info(multi_bank)["root_type"] == "root2"


def _report_paths(results_dir):
    reports = os.path.join(results_dir, "reports")
    best = [f for f in os.listdir(reports)
            if f.startswith("BEST_detailed_results")]
    return reports, best


def test_fused_trainer_end_to_end(corpus, tmp_path):
    cfg = _dad_cfg(tmp_path)
    trainer = FusedCrossDomainTrainer(
        cfg, corpus, TINY_ENC, tiny_enc_params(),
        fused_cfg=FusedConfig(encoder=TINY_ENC, dad=cfg, inject_snr_db=10.0),
        fold=0, prefetch_depth=0, wav_buckets=(8000,),
    )
    out = trainer.train()
    assert "noisy_test" in out, "no best checkpoint was ever saved"
    rd = trainer.results_dir
    # layered dir parity with the offline-tree runs
    assert f"root1{os.sep}white{os.sep}10db" in rd
    reports, best = _report_paths(rd)
    assert best, "missing BEST_detailed_results report"
    with open(os.path.join(reports, best[0])) as f:
        rep = json.load(f)

    # schema must match the feature-level trainer byte-for-key: run it on
    # the SAME in-memory stores the fused trainer extracted
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.dad_trainer import (
        CrossDomainTrainer,
    )

    cfg2 = _dad_cfg(tmp_path, results_base_dir=str(tmp_path / "ref_results"))
    from dataclasses import replace

    cfg2 = replace(cfg2, clean_data_dir="clean",
                   noisy_data_dir="root1-white-10db")
    ref = CrossDomainTrainer(
        cfg2, fold=0, clean_store=trainer.clean_store,
        noisy_store=trainer.noisy_store, prefetch_depth=0,
    )
    ref_out = ref.train()
    assert "noisy_test" in ref_out
    _ref_reports, ref_best = _report_paths(ref.results_dir)
    with open(os.path.join(_ref_reports, ref_best[0])) as f:
        ref_rep = json.load(f)
    def keyset(d, prefix=""):
        out = set()
        for k, v in d.items():
            out.add(prefix + k)
            if isinstance(v, dict):
                out |= keyset(v, prefix + k + ".")
        return out

    assert keyset(rep) == keyset(ref_rep)

    # the full artifact set exists (training_history + final test report +
    # confusion matrices + best .pth)
    hist = json.load(open(os.path.join(reports, "training_history.json")))
    assert "dacp_ema_thresholds" in hist and hist["dacp_ema_thresholds"]
    assert "FINAL_test_set_results.json" in os.listdir(reports)
    assert os.path.exists(os.path.join(
        rd, "models", "emodb_cross_domain_best.pth"))
    plots = os.listdir(os.path.join(rd, "plots"))
    assert any(f.endswith(".png") for f in plots)
    # the tone corpus is separable: the best noisy WA must be far above
    # chance (25%)
    assert out["best_noisy_weighted_acc"] >= 40.0


def test_run_fused_cv_shares_startup(corpus, tmp_path, monkeypatch):
    """run_fused_cv hoists the fold-independent startup (wav decode, the
    two extraction passes, fixed injection) out of the fold loop: the
    summary covers both folds while prepare_fused_shared ran exactly
    once."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train import (
        fused_trainer as ft,
    )

    calls = {"n": 0}
    real = ft.prepare_fused_shared

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(ft, "prepare_fused_shared", counting)
    cfg = _dad_cfg(tmp_path, epochs=2)
    summary = ft.run_fused_cv(
        cfg, corpus, TINY_ENC, tiny_enc_params(), folds=[0, 1],
        prefetch_depth=0,
    )
    assert calls["n"] == 1
    assert len(summary["folds"]) == 2
    assert all("error" not in r for r in summary["folds"]), summary["folds"]
    assert summary["noise"] == "root1-white-10db"
    assert os.path.exists(
        os.path.join(cfg.results_base_dir, "final_summary_report.json")
    )


def test_fused_trainer_dp_mesh_matches_single(corpus, tmp_path):
    """dp=8 fused trainer epoch == single-device epoch on the same data
    (VERDICT r2 #3: mesh-sharded execution of the actual trainer)."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.parallel import (
        make_mesh,
    )

    cfg = _dad_cfg(tmp_path, epochs=2)
    single = FusedCrossDomainTrainer(
        cfg, corpus, TINY_ENC, tiny_enc_params(), fold=0, prefetch_depth=0,
        fused_cfg=FusedConfig(encoder=TINY_ENC, dad=cfg, inject_snr_db=10.0),
        wav_buckets=(8000,),
    )
    avg1 = single.train_epoch(0)

    cfg2 = _dad_cfg(tmp_path, epochs=2,
                    results_base_dir=str(tmp_path / "mesh_results"))
    mesh = make_mesh(8, tp=1, axis_names=("dp",))
    with mesh:
        sharded = FusedCrossDomainTrainer(
            cfg2, corpus, TINY_ENC, tiny_enc_params(), fold=0,
            prefetch_depth=0, mesh=mesh, wav_buckets=(8000,),
            fused_cfg=FusedConfig(encoder=TINY_ENC, dad=cfg2,
                                  inject_snr_db=10.0),
        )
        avg8 = sharded.train_epoch(0)
    for k in avg1:
        np.testing.assert_allclose(avg1[k], avg8[k], rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(single.anchors), np.asarray(sharded.anchors),
        rtol=1e-4, atol=1e-5,
    )


# ---------------------------------------------------------------------------
# fused ablation harness (exp/runner.py + exp/ablation.py, round 3)


def test_split_fused_overrides():
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.exp.runner import (
        split_fused_overrides,
    )

    dad_ov, inj = split_fused_overrides({
        "USE_DACP": False,
        "INJECT_NOISE_MODE": "fixed",
        "INJECT_NOISE_TYPE": "factory",
        "INJECT_SNR_DB": 5,
    })
    assert dad_ov == {"USE_DACP": False}
    assert inj == {
        "inject_noise_bank_mode": "fixed",
        "inject_noise_type": 2,  # NOISE_TYPES.index("factory")
        "inject_snr_db": 5.0,
        "inject_snr_choices": None,  # single SNR supersedes a base multi
    }
    # multi-SNR supersedes a base single SNR
    _ov, inj2 = split_fused_overrides({"INJECT_SNR_CHOICES": (20, 10)})
    assert inj2 == {"inject_snr_choices": (20.0, 10.0),
                    "inject_snr_db": None}
    with pytest.raises(ValueError):
        split_fused_overrides({"INJECT_NOISE_MODE": "type_specific"})


def _make_noise_root(tmp_path):
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.wavio import (
        write_wav,
    )

    root = os.path.join(str(tmp_path), "5types")
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(5)
    for fname in ("babble.wav", "f16.wav", "factory1.wav",
                  "hfchannel.wav", "volvo.wav"):
        write_wav(os.path.join(root, fname),
                  (rng.normal(size=3000) * 0.1).astype(np.float32), 16000)
    return root


def test_fused_ablation_suite(corpus, tmp_path, monkeypatch):
    """The ablation harness drives the fused trainer: mechanism toggles
    reuse the whole startup (wav decode + clean AND noisy extraction);
    a noise-grid cell rebuilds ONLY the fixed noisy val/test domain, and
    its layered results dir matches an offline-tree run of that cell."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.exp import (
        run_fused_ablation_suite,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.extract import (
        FeatureExtractor,
    )

    calls = {"n": 0}
    real = FeatureExtractor.extract_clips

    def counting(self, clips):
        calls["n"] += 1
        return real(self, clips)

    monkeypatch.setattr(FeatureExtractor, "extract_clips", counting)

    noise_root = _make_noise_root(tmp_path)
    cfg = _dad_cfg(tmp_path, epochs=3)
    experiments = {
        "full_method": {},
        "no_dacp": {"USE_DACP": False},
        "babble_5db": {"INJECT_NOISE_MODE": "fixed",
                       "INJECT_NOISE_TYPE": "babble",
                       "INJECT_SNR_DB": 5.0},
    }
    out_path = os.path.join(str(tmp_path), "ablation_results.json")
    results = run_fused_ablation_suite(
        cfg, experiments, corpus, TINY_ENC, tiny_enc_params(),
        noise_root=noise_root, fold=0, output_path=out_path,
        prefetch_depth=0,
    )
    assert [r["name"] for r in results] == list(experiments)
    assert all("error" not in r for r in results), results
    for r in results:
        assert 0.0 <= r["noisy_wa"] <= 100.0
        assert 0.0 <= r["best_noisy_weighted_acc"] <= 100.0

    # startup sharing: base prepare_fused_shared = 2 extraction passes
    # (clean + fixed noisy); the injection cell adds exactly 1 (noisy
    # refresh); mechanism toggles add none
    assert calls["n"] == 3, calls

    # layered dirs: mechanism ablations keep the base injection's tree,
    # the noise cell gets its own root1-babble-5db tree
    sep = os.sep
    assert f"root1{sep}white{sep}10db" in results[0]["results_dir"]
    assert f"{sep}no_dacp{sep}" in results[1]["results_dir"]
    assert f"root1{sep}babble{sep}5db" in results[2]["results_dir"]

    # results JSON + markdown table contract (run_ablation_suite parity)
    with open(out_path) as f:
        dumped = json.load(f)
    assert [r["name"] for r in dumped] == list(experiments)
    md = out_path.replace(".json", ".md")
    with open(md) as f:
        table = f.read()
    assert "babble_5db" in table and "FAILED" not in table


def test_fused_sensitivity_sweep(corpus, tmp_path, monkeypatch):
    """Fused sensitivity sweep: knob points share ONE startup (sweep knobs
    never change the injection, so nothing is re-extracted), and the
    JSON/plot contract matches the feature-level sweep."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.exp import (
        run_fused_sensitivity_sweep,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.extract import (
        FeatureExtractor,
    )

    calls = {"n": 0}
    real = FeatureExtractor.extract_clips

    def counting(self, clips):
        calls["n"] += 1
        return real(self, clips)

    monkeypatch.setattr(FeatureExtractor, "extract_clips", counting)

    cfg = _dad_cfg(tmp_path, epochs=3)
    out_dir = os.path.join(str(tmp_path), "sens")
    results = run_fused_sensitivity_sweep(
        cfg, "WEIGHT_ECDA", corpus, TINY_ENC, tiny_enc_params(),
        values=[0.0, 0.3], fold=0, output_dir=out_dir, prefetch_depth=0,
    )
    assert len(results) == 2
    assert all("error" not in r for r in results), results
    assert [r["value"] for r in results] == [0.0, 0.3]
    assert all(r["knob"] == "WEIGHT_ECDA" for r in results)
    # one prepare_fused_shared (clean + fixed noisy) for the whole sweep
    assert calls["n"] == 2, calls
    assert os.path.exists(os.path.join(out_dir, "sensitivity_WEIGHT_ECDA.json"))


def test_parse_injection_cells():
    """CLI `--multi-noise` cell spec: 'grid' -> None (full grid downstream);
    type@snr lists -> explicit injection-override cells."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.exp import (
        parse_injection_cells,
    )

    assert parse_injection_cells("grid") is None
    cells = parse_injection_cells("babble@10, f16@0")
    assert cells == {
        "babble_10db": {"INJECT_NOISE_MODE": "fixed",
                        "INJECT_NOISE_TYPE": "babble",
                        "INJECT_SNR_DB": 10.0},
        "f16_0db": {"INJECT_NOISE_MODE": "fixed",
                    "INJECT_NOISE_TYPE": "f16",
                    "INJECT_SNR_DB": 0.0},
    }
    # fractional SNRs keep distinct names (no int truncation collisions)
    assert "volvo_7.5db" in parse_injection_cells("volvo@7.5")
    with pytest.raises(ValueError):
        parse_injection_cells("babble@")
    # a non-'grid' spec without @ (e.g. a pasted dir list) must error, not
    # silently launch the full 16-cell grid
    with pytest.raises(ValueError):
        parse_injection_cells("root1-babble-10db,root1-f16-10db")
    with pytest.raises(ValueError):  # unknown type fails pre-startup
        parse_injection_cells("bable@10")
    with pytest.raises(ValueError):  # duplicate cell name
        parse_injection_cells("babble@10,babble@10.0")


def test_fused_multi_noise_suite(corpus, tmp_path, monkeypatch):
    """run_fused_multi_noise_suite: mechanisms averaged over injection
    cells with cell-outer amortization — ONE clean extraction at startup
    (the base noisy domain is skipped: every cell overrides it) plus ONE
    noisy refresh per cell shared across all mechanisms; summary JSON +
    markdown written."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.exp import (
        run_fused_multi_noise_suite,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.extract import (
        FeatureExtractor,
    )

    calls = {"n": 0}
    real = FeatureExtractor.extract_clips

    def counting(self, clips):
        calls["n"] += 1
        return real(self, clips)

    monkeypatch.setattr(FeatureExtractor, "extract_clips", counting)

    noise_root = _make_noise_root(tmp_path)
    cfg = _dad_cfg(tmp_path, epochs=3)
    cells = {
        "babble_10db": {"INJECT_NOISE_MODE": "fixed",
                        "INJECT_NOISE_TYPE": "babble",
                        "INJECT_SNR_DB": 10.0},
        "f16_10db": {"INJECT_NOISE_MODE": "fixed",
                     "INJECT_NOISE_TYPE": "f16",
                     "INJECT_SNR_DB": 10.0},
    }
    out = os.path.join(str(tmp_path), "multi.json")
    suite = {"no_dacp": {"USE_DACP": False},
             "no_repulsion": {"ECDA_REPULSION_WEIGHT_DELTA": 0.0}}
    results = run_fused_multi_noise_suite(
        cfg, suite, corpus, TINY_ENC,
        tiny_enc_params(), cells=cells, noise_root=noise_root, fold=0,
        output_path=out, prefetch_depth=0,
    )
    assert [r["name"] for r in results] == list(suite)
    for r in results:
        assert set(r["per_noise"]) == set(cells)
        assert r["mean_noisy_wa"] is not None
        for cell_res in r["per_noise"].values():
            assert "error" not in cell_res, cell_res
    # clean startup pass + ONE noisy refresh per cell, shared across BOTH
    # mechanisms (cells-outer loop; the skipped base noisy domain and the
    # per-mechanism re-refreshes would each add passes here)
    assert calls["n"] == 3, calls
    assert os.path.exists(out)
    md = open(out.replace(".json", ".md")).read()
    assert "no_dacp" in md and "no_repulsion" in md and "FAILED" not in md


# ---------------------------------------------------------------------------
# device-resident corpus (parallel/resident.py, round 4)


def test_index_batches_matches_iterators(corpus):
    """index_batches is the exact index-only projection of both iterator
    flavors: same ids, same bucket length, for shuffled and ordered
    epochs."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.batching import (
        PaddedBatchIterator,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.store import (
        FeatureStore,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.parallel.resident import (
        index_batches,
    )

    cfg = _dad_cfg("/tmp")
    store = load_wav_store(corpus, cfg.label_map)
    for shuffle in (False, True):
        it = PaddedWavIterator(store, 8, buckets=(4000, 8000, 16000),
                               shuffle=shuffle, seed=11)
        for epoch in (0, 3):
            got = list(index_batches(it, epoch))
            it.set_epoch(epoch)
            want = list(it)
            assert len(got) == len(want)
            for (idx, T), b in zip(got, want):
                np.testing.assert_array_equal(idx, b.ids)
                assert T == b.wav.shape[1]

    rng = np.random.default_rng(0)
    sizes = rng.integers(3, 40, 30).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    fs = FeatureStore(
        feats=rng.normal(size=(int(sizes.sum()), 4)).astype(np.float32),
        sizes=sizes, offsets=offsets,
        labels=rng.integers(0, 4, 30).astype(np.int32),
    )
    it = PaddedBatchIterator(fs, 7, buckets=(8, 16, 32, 64), shuffle=True,
                             seed=5, max_frames=20)
    for epoch in (0, 2):
        got = list(index_batches(it, epoch))
        it.set_epoch(epoch)
        want = list(it)
        assert len(got) == len(want)
        for (idx, T), b in zip(got, want):
            np.testing.assert_array_equal(idx, b.ids)
            assert T == b.feats.shape[1]


def test_gather_clips_matches_host_assembly(corpus):
    """On-device gather == the iterator's host row assembly, bit for bit
    (zero pad fill, True=pad mask, frame cap)."""
    import jax.numpy as jnp

    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.parallel.resident import (
        gather_clips,
        index_batches,
        resident_from_store,
    )

    cfg = _dad_cfg("/tmp")
    store = load_wav_store(corpus, cfg.label_map)
    res = resident_from_store(store)
    it = PaddedWavIterator(store, 8, buckets=(4000, 8000, 16000),
                           shuffle=True, seed=2)
    it.set_epoch(1)
    want = list(it)
    for (idx, T), b in zip(index_batches(it, 1), want):
        wav, mask = gather_clips(res, jnp.asarray(idx), T)
        np.testing.assert_array_equal(np.asarray(wav), b.wav)
        np.testing.assert_array_equal(np.asarray(mask), b.wav_mask)


def test_resident_corpus_matches_streaming(corpus, tmp_path):
    """VERDICT r3 item 2: the device-resident corpus path must be
    semantically IDENTICAL to host streaming — every per-epoch loss term,
    the updated student params, the DACP state, and the per-sample
    confirmation-bias log."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.fused_trainer import (
        prepare_fused_shared,
    )

    cfg = _dad_cfg(tmp_path, epochs=3)
    fused = FusedConfig(encoder=TINY_ENC, dad=cfg, inject_snr_db=10.0,
                        cache_clean_features=True)
    shared = prepare_fused_shared(cfg, corpus, TINY_ENC, tiny_enc_params(),
                                  fused, None)

    def build(resident, sub):
        c = _dad_cfg(tmp_path, epochs=3,
                     results_base_dir=str(tmp_path / sub))
        return FusedCrossDomainTrainer(
            c, corpus, TINY_ENC, tiny_enc_params(),
            fused_cfg=FusedConfig(encoder=TINY_ENC, dad=c,
                                  inject_snr_db=10.0),
            fold=0, prefetch_depth=0, wav_buckets=(8000,),
            shared=shared, resident=resident,
        )

    stream = build(False, "stream")
    res = build(True, "res")
    assert stream._resident is None and res._resident is not None

    for epoch in (0, 1):  # warmup + post-warmup (DACP/ECDA/EMA/tracking)
        a = stream.train_epoch(epoch)
        b = res.train_epoch(epoch)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-6, atol=1e-7,
                                       err_msg=f"epoch {epoch} {k}")

    for pa, pb in zip(jax.tree.leaves(stream.state.ssrl.student),
                      jax.tree.leaves(res.state.ssrl.student)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-6, atol=1e-7)
    for da, db in zip(jax.tree.leaves(stream.state.dacp),
                      jax.tree.leaves(res.state.dacp)):
        np.testing.assert_allclose(np.asarray(da), np.asarray(db),
                                   rtol=1e-6, atol=1e-7)
    assert stream.bias_analysis_log == res.bias_analysis_log
    assert len(res.bias_analysis_log) > 0


def test_fused_resident_scanned_matches_per_step(corpus, tmp_path):
    """make_resident_fused_epoch_runner == a per-step make_resident_fused_step
    loop, value for value, given the same per-step keys and the same
    chunk-common (t_clean, t_wav) padding — scan changes dispatch cadence,
    not numerics."""
    import jax.numpy as jnp

    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.dad import (
        StepScalars,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.parallel.resident import (
        make_resident_fused_epoch_runner,
        make_resident_fused_step,
        paired_index_epoch,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.fused_trainer import (
        prepare_fused_shared,
    )

    cfg = _dad_cfg(tmp_path, epochs=3)
    fused = FusedConfig(encoder=TINY_ENC, dad=cfg, inject_snr_db=10.0,
                        cache_clean_features=True)
    shared = prepare_fused_shared(cfg, corpus, TINY_ENC, tiny_enc_params(),
                                  fused, None)
    t = FusedCrossDomainTrainer(
        cfg, corpus, TINY_ENC, tiny_enc_params(), fused_cfg=fused,
        fold=0, prefetch_depth=0, wav_buckets=(8000,), shared=shared,
        resident=True,
    )
    step = t._resident_step
    runner = make_resident_fused_epoch_runner(
        t.extractor.model, t.head, t.tx, t.fused_cfg
    )
    clean_c, wav_c = t._resident
    cap = t.clean_train.max_frames
    pairs = list(paired_index_epoch(t.clean_train, t.noisy_wav_train, 1))[:4]
    S = len(pairs)
    assert S >= 2
    t_c = max(tc for (_i, tc), _ in pairs)
    t_w = max(tw for _, (_i, tw) in pairs)
    scalars = StepScalars.for_epoch(cfg, 1)  # post-warmup: DACP/ECDA active
    key = jax.random.PRNGKey(3)
    keys = jax.random.split(key, S)

    copy = lambda tree: jax.tree.map(jnp.array, tree)  # noqa: E731 (donated)
    s_loop = copy(t.state)
    loop_metrics = []
    for i, ((ci, _tc), (wi, _tw)) in enumerate(pairs):
        s_loop, m = step(
            t.enc_params, s_loop, clean_c, wav_c, jnp.asarray(ci),
            jnp.asarray(wi), scalars, t.anchors, keys[i], None,
            t_clean=t_c, t_wav=t_w, frame_cap=cap,
        )
        loop_metrics.append(float(m["total_loss"]))

    cidx = jnp.asarray(np.stack([c for (c, _), _ in pairs]))
    widx = jnp.asarray(np.stack([w for _, (w, _) in pairs]))
    s_scan, metrics = runner(
        t.enc_params, copy(t.state), clean_c, wav_c, cidx, widx, scalars,
        t.anchors, key, None, t_clean=t_c, t_wav=t_w, frame_cap=cap,
    )
    np.testing.assert_allclose(
        np.asarray(metrics["total_loss"]), loop_metrics, rtol=2e-5
    )
    for pa, pb in zip(jax.tree.leaves(s_loop.ssrl.student),
                      jax.tree.leaves(s_scan.ssrl.student)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-4, atol=1e-6)
    for da, db in zip(jax.tree.leaves(s_loop.dacp),
                      jax.tree.leaves(s_scan.dacp)):
        np.testing.assert_allclose(np.asarray(da), np.asarray(db),
                                   rtol=1e-4, atol=1e-6)


def test_fused_trainer_scan_chunk_end_to_end(corpus, tmp_path):
    """FusedCrossDomainTrainer(scan_chunk>0) trains through the chunked
    runner end to end (trailing short chunk included) and produces the
    standard report set; mesh + scan_chunk is rejected."""
    cfg = _dad_cfg(tmp_path, epochs=3)
    fused = FusedConfig(encoder=TINY_ENC, dad=cfg, inject_snr_db=10.0,
                        cache_clean_features=True)
    t = FusedCrossDomainTrainer(
        cfg, corpus, TINY_ENC, tiny_enc_params(), fused_cfg=fused,
        fold=0, prefetch_depth=0, wav_buckets=(8000,),
        resident=True, scan_chunk=3,  # 8 steps/epoch -> 3+3+2 chunks
    )
    assert t._resident is not None and t._resident_runner is not None
    t.train()
    assert np.isfinite(t.best_noisy_weighted_acc)
    rep = os.path.join(
        cfg.results_base_dir,
        [d for d in os.listdir(cfg.results_base_dir)][0],
    )
    names = []
    for root, _d, files in os.walk(rep):
        names += files
    assert any(n.startswith("BEST_detailed_results") for n in names)

    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.parallel import (
        make_mesh,
    )

    with pytest.raises(ValueError, match="scan_chunk"):
        FusedCrossDomainTrainer(
            cfg, corpus, TINY_ENC, tiny_enc_params(), fused_cfg=fused,
            fold=0, mesh=make_mesh(2, tp=1, axis_names=("dp",)),
            scan_chunk=2,
        )


def test_resident_auto_budget_fallback(corpus, tmp_path):
    """'auto' falls back to streaming when the estimate exceeds the HBM
    budget (VERDICT r3 item 2: 'fall back to streaming when the corpus
    doesn't fit')."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.fused_trainer import (
        prepare_fused_shared,
    )

    cfg = _dad_cfg(tmp_path, epochs=1)
    fused = FusedConfig(encoder=TINY_ENC, dad=cfg, inject_snr_db=10.0,
                        cache_clean_features=True)
    shared = prepare_fused_shared(cfg, corpus, TINY_ENC, tiny_enc_params(),
                                  fused, None)
    t = FusedCrossDomainTrainer(
        cfg, corpus, TINY_ENC, tiny_enc_params(),
        fused_cfg=fused, fold=0, prefetch_depth=0, wav_buckets=(8000,),
        shared=shared, resident="auto", resident_max_bytes=16,
    )
    assert t._resident is None
    avg = t.train_epoch(0)  # streaming path still trains
    assert np.isfinite(avg["total_loss"])


def test_resident_matches_streaming_with_bucket_batches(corpus, tmp_path):
    """bucket_batches=True (round 5: bucket-homogeneous training batches)
    must keep the resident gather path bit-identical to host streaming —
    the grouped epoch order flows through data/batching.py epoch_order into
    both the host iterators and the index projection."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.fused_trainer import (
        prepare_fused_shared,
    )

    cfg = _dad_cfg(tmp_path, epochs=3, bucket_batches=True)
    fused = FusedConfig(encoder=TINY_ENC, dad=cfg, inject_snr_db=10.0,
                        cache_clean_features=True)
    shared = prepare_fused_shared(cfg, corpus, TINY_ENC, tiny_enc_params(),
                                  fused, None)
    buckets = (4000, 6000, 8000)  # multiple buckets so grouping matters

    def build(resident, sub):
        c = _dad_cfg(tmp_path, epochs=3, bucket_batches=True,
                     results_base_dir=str(tmp_path / sub))
        return FusedCrossDomainTrainer(
            c, corpus, TINY_ENC, tiny_enc_params(),
            fused_cfg=FusedConfig(encoder=TINY_ENC, dad=c,
                                  inject_snr_db=10.0),
            fold=0, prefetch_depth=0, wav_buckets=buckets,
            shared=shared, resident=resident,
        )

    stream = build(False, "stream")
    res = build(True, "res")
    assert res._resident is not None
    # grouping engaged on the train iterators only
    assert stream.noisy_wav_train.bucket_shuffle
    assert stream.clean_train.bucket_shuffle
    assert not stream.clean_test.bucket_shuffle

    for epoch in (0, 1):
        a = stream.train_epoch(epoch)
        b = res.train_epoch(epoch)
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-6, atol=1e-7,
                                       err_msg=f"epoch {epoch} {k}")
    for pa, pb in zip(jax.tree.leaves(stream.state.ssrl.student),
                      jax.tree.leaves(res.state.ssrl.student)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-6, atol=1e-7)
    assert stream.bias_analysis_log == res.bias_analysis_log
