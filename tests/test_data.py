import numpy as np
import pytest

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
    apply_overrides,
    dad_preset,
    pretrain_preset,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data import (
    Batch,
    PaddedBatchIterator,
    casia_fold_speakers,
    corpus_fold_split,
    emodb_fold_speakers,
    iemocap_fold_sessions,
    load_feature_store,
    pad_to_bucket,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.batching import (
    paired_epoch,
)

from helpers import make_iemocap_dir, make_spk_dir


def test_store_roundtrip_iemocap(tmp_path):
    d, clips, labels, names = make_iemocap_dir(tmp_path)
    store = load_feature_store(d, label_map={"ang": 0, "hap": 1, "neu": 2, "sad": 3})
    assert store.validate()
    assert store.num == len(clips)
    np.testing.assert_allclose(store.clip(3), clips[3])
    assert store.labels[1] == 1
    # session ids parsed from char 4 of the utt name
    assert store.groups[0] == 1 and store.groups[4] == 5


def test_store_roundtrip_spk(tmp_path):
    d, clips, lbls, spks = make_spk_dir(tmp_path, ["casia_spk_1", "casia_spk_2"])
    lm = {"angry": 0, "happy": 1, "neutral": 2, "sad": 3}
    store = load_feature_store(d, label_map=lm)
    assert store.validate()
    assert list(np.unique(store.groups)) == ["casia_spk_1", "casia_spk_2"]


def test_store_min_length_skips(tmp_path):
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.store import (
        write_feature_store,
    )

    clips = [np.ones((1, 4), np.float32), np.ones((5, 4), np.float32)]
    write_feature_store(str(tmp_path), clips, labels=["ang", "hap"],
                        utt_names=["Ses01A_x_F000", "Ses02A_x_F001"], sidecar="emo")
    store = load_feature_store(str(tmp_path), min_length=3)
    assert store.num == 1
    np.testing.assert_allclose(store.clip(0), clips[1])


def test_subset_contiguous(tmp_path):
    d, clips, *_ = make_iemocap_dir(tmp_path)
    store = load_feature_store(d, label_map={"ang": 0, "hap": 1, "neu": 2, "sad": 3})
    sub = store.subset([5, 2, 9])
    assert sub.validate()
    np.testing.assert_allclose(sub.clip(0), clips[5])
    np.testing.assert_allclose(sub.clip(1), clips[2])
    np.testing.assert_allclose(sub.clip(2), clips[9])


def test_iemocap_fold_table():
    # reference data.py:53-59
    assert iemocap_fold_sessions(1) == ([1, 2, 3], 4, 5)
    assert iemocap_fold_sessions(4) == ([4, 5, 1], 2, 3)
    with pytest.raises(ValueError):
        iemocap_fold_sessions(0)


def test_casia_folds():
    spks = [f"casia_spk_{i}" for i in range(1, 5)]
    train, val, test = casia_fold_speakers(0, spks)
    assert test == "casia_spk_1" and val == "casia_spk_2"
    assert train == ["casia_spk_3", "casia_spk_4"]


def test_emodb_folds():
    train, val, test = emodb_fold_speakers(9)
    assert test == "16" and val == "03" and len(train) == 8


def test_corpus_fold_split_disjoint(tmp_path):
    d, *_ = make_iemocap_dir(tmp_path, n=50)
    store = load_feature_store(d, label_map={"ang": 0, "hap": 1, "neu": 2, "sad": 3})
    tr, va, te = corpus_fold_split("iemocap", 0, store.groups)
    assert len(set(tr) & set(va)) == 0
    assert len(set(tr) & set(te)) == 0
    assert len(tr) + len(va) + len(te) == store.num
    # fold 0 == reference fold_id 1: train sessions 1,2,3
    assert set(store.groups[tr]) == {1, 2, 3}


def test_emodb_group_normalization():
    groups = np.array([f"emodb_spk_{s}" for s in ["03", "08", "16", "03"]])
    tr, va, te = corpus_fold_split("emodb", 0, groups)
    assert list(te) == [0, 3]  # speaker 03 is fold-0 test


def test_bucketing():
    assert pad_to_bucket(3, (64, 128)) == 64
    assert pad_to_bucket(65, (64, 128)) == 128
    assert pad_to_bucket(200, (64, 128)) == 256  # beyond top: multiple of top


def test_batch_iterator_shapes(tmp_path):
    d, clips, *_ = make_iemocap_dir(tmp_path, n=21)
    store = load_feature_store(d, label_map={"ang": 0, "hap": 1, "neu": 2, "sad": 3})
    it = PaddedBatchIterator(store, batch_size=8, buckets=(16, 32), shuffle=False)
    batches = list(it)
    assert len(batches) == 3
    for b in batches:
        assert isinstance(b, Batch)
        assert b.feats.shape[0] == 8
        assert b.feats.shape[1] in (16, 32)
        # mask consistency: valid rows have at least one real frame
        for row in range(8):
            if b.row_valid[row]:
                assert not b.padding_mask[row, 0]
    # last batch padded: 21 = 8+8+5
    assert b.row_valid.sum() == 5
    assert (b.labels[~b.row_valid] == -1).all()


def test_batch_iterator_shuffle_deterministic(tmp_path):
    d, *_ = make_iemocap_dir(tmp_path, n=20)
    store = load_feature_store(d, label_map={"ang": 0, "hap": 1, "neu": 2, "sad": 3})
    it = PaddedBatchIterator(store, batch_size=4, shuffle=True, seed=7)
    it.set_epoch(3)
    ids_a = np.concatenate([b.ids for b in it])
    it2 = PaddedBatchIterator(store, batch_size=4, shuffle=True, seed=7)
    it2.set_epoch(3)
    ids_b = np.concatenate([b.ids for b in it2])
    np.testing.assert_array_equal(ids_a, ids_b)
    it.set_epoch(4)
    ids_c = np.concatenate([b.ids for b in it])
    assert not np.array_equal(ids_a, ids_c)


def test_paired_epoch_truncates(tmp_path):
    d, *_ = make_iemocap_dir(tmp_path, n=20)
    store = load_feature_store(d, label_map={"ang": 0, "hap": 1, "neu": 2, "sad": 3})
    a = PaddedBatchIterator(store, batch_size=4, shuffle=True, seed=0)
    b = PaddedBatchIterator(store.subset(range(8)), batch_size=4, shuffle=True, seed=1)
    pairs = list(paired_epoch(a, b, epoch=0))
    assert len(pairs) == 2  # min(5, 2)


def test_config_presets_and_overrides():
    cfg = dad_preset("iemocap")
    assert cfg.dacp.use_dacp and cfg.weight_ecda == 0.3
    casia = dad_preset("casia")
    assert not casia.dacp.use_dacp and casia.dacp.fixed_confidence_threshold == 0.75
    emodb = dad_preset("emodb")
    assert emodb.learning_rate == 5e-3 and emodb.dacp.quality_smoothing_beta == 0.8

    # reference-style UPPER_SNAKE override routing
    cfg2 = apply_overrides(cfg, {"USE_DACP": False, "WEIGHT_ECDA": 0.0,
                                 "dacp.sensitivity_k": 5.0})
    assert not cfg2.dacp.use_dacp and cfg2.weight_ecda == 0.0
    assert cfg2.dacp.sensitivity_k == 5.0
    assert cfg.dacp.use_dacp  # original untouched

    with pytest.raises(KeyError):
        apply_overrides(cfg, {"NOT_A_KNOB": 1})

    pt = pretrain_preset("emodb")
    assert pt.batch_size == 32 and pt.n_folds == 10


def test_alias_import():
    import dad_tpu

    assert hasattr(dad_tpu, "__version__")
    import dad_tpu.data as dd
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu import (
        data as canonical_data,
    )

    assert dd is canonical_data


def test_short_sidecars_rejected(tmp_path, rng):
    """A labels/speakers sidecar shorter than the clip count must fail
    loudly — a silent shift would break speaker-isolated folds."""
    from helpers import make_iemocap_dir as mk
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.store import (
        load_feature_store,
    )

    import os

    d, *_ = mk(tmp_path / "s", n=8, dim=4, seed=0)
    # truncate the .emo sidecar by one line
    emo = os.path.join(d, "train.emo")
    lines = open(emo).read().splitlines()
    with open(emo, "w") as f:
        f.write("\n".join(lines[:-1]) + "\n")
    with pytest.raises(ValueError, match="labels"):
        load_feature_store(d, {"ang": 0, "hap": 1, "neu": 2, "sad": 3})
