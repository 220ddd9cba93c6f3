"""Async input-pipeline tests (data/prefetch.py): equivalence with direct
iteration, exception propagation, early-abandon shutdown, device placement,
and trainer integration."""

import threading
import time

import numpy as np
import pytest

import jax

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.batching import (
    Batch,
    PaddedBatchIterator,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.prefetch import (
    prefetch,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.store import (
    load_feature_store,
)

from helpers import make_iemocap_dir


def test_prefetch_preserves_order_and_values():
    items = [np.full((3,), i) for i in range(20)]
    got = list(prefetch(iter(items), depth=3))
    assert len(got) == 20
    for i, g in enumerate(got):
        np.testing.assert_array_equal(g, items[i])


def test_prefetch_depth_zero_is_synchronous():
    items = list(range(5))
    assert list(prefetch(items, depth=0)) == items


def test_prefetch_depth_zero_still_honors_transfer_dtype():
    # depth only controls lookahead; --transfer-dtype must not be silently
    # dropped at --prefetch-depth 0
    import ml_dtypes

    x = np.linspace(-2, 2, 12).astype(np.float32)
    (got,) = list(prefetch([x], depth=0, transfer_fp32_as="bfloat16"))
    want = x.astype(ml_dtypes.bfloat16).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(got), want)
    (dev,) = list(prefetch([x], depth=0, to_device=True))
    assert hasattr(dev, "devices")  # a jax.Array, not host numpy


def test_prefetch_propagates_worker_exception():
    def gen():
        yield 1
        raise ValueError("boom")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_prefetch_worker_stops_on_early_abandon():
    n_before = threading.active_count()

    def gen():
        for i in range(10_000):
            yield np.zeros((100,)) + i

    it = prefetch(gen(), depth=2)
    next(it)
    it.close()  # consumer abandons mid-stream
    deadline = time.time() + 5.0
    while threading.active_count() > n_before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n_before


def test_prefetch_to_device_places_arrays():
    batch = Batch(
        feats=np.zeros((2, 3, 4), np.float32),
        padding_mask=np.zeros((2, 3), bool),
        labels=np.zeros((2,), np.int32),
        ids=np.arange(2, dtype=np.int32),
        row_valid=np.ones((2,), bool),
    )
    (got,) = list(prefetch([batch], depth=1, to_device=True))
    assert isinstance(got.feats, jax.Array)
    np.testing.assert_array_equal(np.asarray(got.feats), batch.feats)
    np.testing.assert_array_equal(np.asarray(got.row_valid), batch.row_valid)


def test_prefetch_transfer_fp32_as_bf16_roundtrip():
    batch = Batch(
        feats=np.linspace(-2, 2, 24).reshape(2, 3, 4).astype(np.float32),
        padding_mask=np.zeros((2, 3), bool),
        labels=np.zeros((2,), np.int32),
        ids=np.arange(2, dtype=np.int32),
        row_valid=np.ones((2,), bool),
    )
    (got,) = list(prefetch([batch], depth=1, transfer_fp32_as="bfloat16"))
    # f32 leaves come back as f32 on device, quantized to bf16 precision
    assert got.feats.dtype == np.float32
    import ml_dtypes  # shipped with jax

    want = batch.feats.astype(ml_dtypes.bfloat16).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(got.feats), want)
    # non-f32 leaves are untouched
    assert got.labels.dtype == np.int32
    np.testing.assert_array_equal(np.asarray(got.padding_mask), batch.padding_mask)


def test_prefetch_matches_direct_batch_iteration(tmp_path):
    d, clips, labels, names = make_iemocap_dir(tmp_path, n=17, dim=6)
    store = load_feature_store(d, {"ang": 0, "hap": 1, "neu": 2, "sad": 3})
    direct = list(PaddedBatchIterator(store, 4, shuffle=True, seed=1))
    it = PaddedBatchIterator(store, 4, shuffle=True, seed=1)
    fetched = list(prefetch(it, depth=2))
    assert len(direct) == len(fetched)
    for a, b in zip(direct, fetched):
        np.testing.assert_array_equal(a.feats, b.feats)
        np.testing.assert_array_equal(a.labels, b.labels)
        np.testing.assert_array_equal(a.padding_mask, b.padding_mask)
