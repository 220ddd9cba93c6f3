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


# ---------------------------------------------------------------------------
# bucket-grouped epoch order (round 5: the product-scale IEMOCAP run showed
# the reference-shaped uniform shuffle pads 3.9x more audio than it trains
# on under static-shape buckets; bucket_shuffle is the opt-in remedy)


def _lognormal_store(tmp_path, n=200, dim=4, seed=3):
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.store import (
        write_feature_store,
    )

    rng = np.random.default_rng(seed)
    clips, labels, names = [], [], []
    for i in range(n):
        t = int(np.clip(rng.lognormal(np.log(20), 0.6), 4, 200))
        clips.append(rng.normal(size=(t, dim)).astype(np.float32))
        labels.append(["ang", "hap", "neu", "sad"][i % 4])
        names.append(f"Ses0{(i % 5) + 1}F_impro01_F{i:03d}")
    d = str(tmp_path)
    write_feature_store(d, clips, labels=labels, utt_names=names, sidecar="emo")
    return load_feature_store(
        d, label_map={"ang": 0, "hap": 1, "neu": 2, "sad": 3}
    )


def test_bucket_shuffle_is_a_permutation_with_same_batch_count(tmp_path):
    store = _lognormal_store(tmp_path)
    kw = dict(batch_size=16, buckets=(16, 32, 64, 128, 256), shuffle=True,
              seed=11)
    base = PaddedBatchIterator(store, **kw)
    grouped = PaddedBatchIterator(store, bucket_shuffle=True, **kw)
    for epoch in (0, 5):
        base.set_epoch(epoch)
        grouped.set_epoch(epoch)
        a = [b for b in base]
        g = [b for b in grouped]
        assert len(a) == len(g)
        ids_a = np.concatenate([b.ids[b.row_valid] for b in a])
        ids_g = np.concatenate([b.ids[b.row_valid] for b in g])
        # same clip multiset per epoch, different grouping
        np.testing.assert_array_equal(np.sort(ids_a), np.sort(ids_g))
        # the short partial batch stays last (consecutive-B slicing contract)
        assert all(b.row_valid.all() for b in g[:-1])
        # strictly fewer (or equal) padded frames than the uniform shuffle
        padded_a = sum(b.feats.shape[1] * len(b.row_valid) for b in a)
        padded_g = sum(b.feats.shape[1] * len(b.row_valid) for b in g)
        assert padded_g < padded_a
        # full batches are bucket-homogeneous: every valid clip in a batch
        # snaps to the batch's own bucket, except the <=n_buckets leftover
        # batches that merge per-bucket remainders
        sizes = store.sizes
        inhomog = 0
        for b in g:
            idx = b.ids[b.row_valid]
            t = b.feats.shape[1]
            snaps = {pad_to_bucket(int(sizes[i]), kw["buckets"]) for i in idx}
            if snaps != {t}:
                inhomog += 1
        assert inhomog <= len(kw["buckets"])


def test_bucket_shuffle_deterministic_and_epoch_varying(tmp_path):
    store = _lognormal_store(tmp_path, n=90)
    kw = dict(batch_size=8, buckets=(16, 64, 256), shuffle=True, seed=5,
              bucket_shuffle=True)
    it1 = PaddedBatchIterator(store, **kw)
    it2 = PaddedBatchIterator(store, **kw)
    it1.set_epoch(2)
    it2.set_epoch(2)
    np.testing.assert_array_equal(
        np.concatenate([b.ids for b in it1]),
        np.concatenate([b.ids for b in it2]),
    )
    it2.set_epoch(3)
    assert not np.array_equal(
        np.concatenate([b.ids for b in it1]),
        np.concatenate([b.ids for b in it2]),
    )


def test_index_batches_matches_bucket_shuffled_iterators(tmp_path):
    """The resident index projection must reproduce bucket-grouped epochs
    bit-exactly for BOTH iterator kinds."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.wavstore import (
        PaddedWavIterator, WavStore,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.parallel.resident import (
        index_batches,
    )

    store = _lognormal_store(tmp_path, n=120)
    feat_it = PaddedBatchIterator(
        store, batch_size=16, buckets=(16, 64, 256), shuffle=True, seed=9,
        bucket_shuffle=True, max_frames=100,
    )
    rng = np.random.default_rng(0)
    sizes = np.clip(rng.lognormal(np.log(8000), 0.7, 77), 500, 64000).astype(
        np.int64
    )
    offsets = np.concatenate([[0], np.cumsum(sizes[:-1])])
    wav_store = WavStore(
        samples=rng.normal(size=int(sizes.sum())).astype(np.float32),
        sizes=sizes, offsets=offsets,
        labels=np.arange(77, dtype=np.int32) % 4,
    )
    wav_it = PaddedWavIterator(
        wav_store, batch_size=8, buckets=(4000, 16000, 64000), shuffle=True,
        seed=13, bucket_shuffle=True,
    )
    for it, t_of in ((feat_it, lambda b: b.feats.shape[1]),
                     (wav_it, lambda b: b.wav.shape[1])):
        for epoch in (0, 7):
            it.set_epoch(epoch)
            real = [(b.ids.astype(np.int32), t_of(b)) for b in it]
            proj = list(index_batches(it, epoch))
            assert len(real) == len(proj)
            for (rid, rt), (pid, pt) in zip(real, proj):
                np.testing.assert_array_equal(rid, pid)
                assert rt == pt


def test_bucket_batches_config_knob():
    cfg = dad_preset("iemocap")
    assert cfg.bucket_batches is False  # reference-shaped default
    cfg2 = apply_overrides(cfg, {"BUCKET_BATCHES": True})
    assert cfg2.bucket_batches is True
