import numpy as np
import pytest

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data import (
    PaddedBatchIterator,
    load_feature_store,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.native import (
    NativeStore,
    native_available,
    npy_data_offset,
)

from helpers import make_iemocap_dir

LM = {"ang": 0, "hap": 1, "neu": 2, "sad": 3}

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native batcher not built"
)


def test_native_matches_numpy_batches(tmp_path):
    d, *_ = make_iemocap_dir(tmp_path, n=37, dim=8)
    store = load_feature_store(d, LM)
    kw = dict(batch_size=8, buckets=(16, 32), shuffle=True, seed=3)
    it_native = PaddedBatchIterator(store, use_native=True, **kw)
    it_numpy = PaddedBatchIterator(store, use_native=False, **kw)
    assert it_native._native is not None
    it_native.set_epoch(2)
    it_numpy.set_epoch(2)
    for bn, bp in zip(it_native, it_numpy):
        np.testing.assert_array_equal(bn.feats, bp.feats)
        np.testing.assert_array_equal(bn.padding_mask, bp.padding_mask)
        np.testing.assert_array_equal(bn.labels, bp.labels)
        np.testing.assert_array_equal(bn.row_valid, bp.row_valid)
        np.testing.assert_array_equal(bn.ids, bp.ids)


def test_native_subset_view(tmp_path):
    d, clips, *_ = make_iemocap_dir(tmp_path, n=20, dim=8)
    store = load_feature_store(d, LM)
    sub = store.subset([3, 7, 11])
    it = PaddedBatchIterator(sub, batch_size=4, buckets=(32,), use_native=True)
    (batch,) = list(it)
    np.testing.assert_allclose(batch.feats[0, : len(clips[3])], clips[3])
    np.testing.assert_allclose(batch.feats[2, : len(clips[11])], clips[11])
    assert not batch.row_valid[3]


def test_native_reflects_inplace_mutation(tmp_path):
    """The wrap-mode store reads the live numpy buffer."""
    d, *_ = make_iemocap_dir(tmp_path, n=5, dim=8)
    store = load_feature_store(d, LM)
    it = PaddedBatchIterator(store, batch_size=5, buckets=(32,), use_native=True)
    store.feats += 1.0
    (batch,) = list(it)
    np.testing.assert_allclose(
        batch.feats[0, : store.sizes[0]], store.clip(0)
    )


def test_mmap_from_file(tmp_path):
    d, clips, *_ = make_iemocap_dir(tmp_path, n=6, dim=8)
    store = load_feature_store(d, LM)
    ns = NativeStore.from_file(
        store.npy_path, store.sizes, store.offsets, store.labels
    )
    feats, mask, labels, valid = ns.assemble(np.array([0, 5, -1]), 32)
    np.testing.assert_allclose(feats[0, : len(clips[0])], clips[0])
    np.testing.assert_allclose(feats[1, : len(clips[5])], clips[5])
    assert not valid[2] and labels[2] == -1
    assert mask[0, len(clips[0]):].all()
    ns.close()


def test_npy_offset(tmp_path):
    p = str(tmp_path / "x.npy")
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    np.save(p, a)
    off = npy_data_offset(p)
    raw = np.fromfile(p, dtype=np.float32, offset=off)
    np.testing.assert_array_equal(raw.reshape(3, 4), a)
