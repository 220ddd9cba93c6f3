"""Device-resident training corpus for the fused wav->train step.

The fused trainer's corpus is STATIC for the entire run: the clean features
are extracted once at startup and the noisy stream re-injects noise into the
same raw waveforms every step. Streaming those bytes from the host every
step re-ships ~14 MB/step of unchanging data — on a tunnel-attached chip
that throttles e2e training to ~110-160 clips/s while the device step runs
~3850 clips/s (PERFORMANCE.md round 3). The reference's hot loop reads from
RAM (train.py:473-496); the TPU-native analogue is HBM: upload the flat
per-fold corpus ONCE (same static-placement principle as committing params
with `jax.device_put`), and gather each batch ON DEVICE from a tiny
host-supplied index vector (~KB/step).

Layout: the corpora stay in the exact flat (total, ...) + (offset, size)
layout the host stores use — no per-clip bucket padding in HBM — and the
step's prologue assembles the padded (B, T[, D]) batch with one gather +
mask. The gathered batches are bit-identical to the host-assembled ones
(zero pad fill, True=pad masks, -1 labels on the unlabeled noisy stream),
so the training semantics are EXACTLY the streaming path's
(tests/test_fused_trainer.py::test_resident_corpus_matches_streaming pins
every loss term and the updated params).
"""

from __future__ import annotations

from typing import Iterator, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.batching import Batch, epoch_order, pad_to_bucket
from ..utils import get_logger
from .fused import (
    CleanFeatureBatch,
    FusedBatch,
    FusedConfig,
    build_fused_step,
)
from .mesh import batch_sharding, replicated

logger = get_logger(__name__)


# 1-D (waveform) corpora pad each clip's storage slot to this many samples
# (512 B at f32 — one sublane tile row) so gather_clips can fetch whole
# blocks: XLA lowers an element-wise (B, t) take from a flat HBM array to
# a scalar gather that measured 0.1 GB/s effective on v5e (490 ms for a
# 64 x 16 s batch — more than the whole encoder step; PERFORMANCE.md
# round 5), while the 128-sample block gather runs at memory speed.
_ALIGN = 128


class ResidentClips(NamedTuple):
    """Flat clip corpus committed to device memory once per run.

    ``flat`` is (total_samples,) for waveforms or (total_frames, D) for
    features; clips are addressed by (offset, size), mirroring
    data/store.FeatureStore and data/wavstore.WavStore. 1-D corpora are
    stored with ``_ALIGN``-sample slot alignment (offsets all multiples of
    ``_ALIGN``, zero fill between clips) — the invariant gather_clips's
    block fast path relies on.
    """

    flat: jax.Array
    offsets: jax.Array  # (N,) int32
    sizes: jax.Array  # (N,) int32
    labels: jax.Array  # (N,) int32, -1 where absent

    @property
    def num(self) -> int:
        return int(self.sizes.shape[0])


def _compact(store) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Contiguous (flat, offsets, sizes) for a store that may be a
    zero-copy subset view — only the subset's clips get uploaded."""
    sizes = np.asarray(store.sizes, np.int64)
    total = int(sizes.sum())
    if total >= 2**31:
        raise ValueError(
            f"corpus too large for int32 addressing ({total} rows)"
        )
    offsets64 = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    if total == 0:
        flat = store_flat(store)[:0]
    elif (
        int(store.offsets[0]) == 0
        and np.array_equal(np.asarray(store.offsets, np.int64), offsets64)
        and total == len(store_flat(store))
    ):
        flat = store_flat(store)
    else:
        flat = np.concatenate(
            [store.clip(i) for i in range(store.num)], axis=0
        )
    return flat, offsets64.astype(np.int32), sizes.astype(np.int32)


def store_flat(store) -> np.ndarray:
    """The flat backing array of either store flavor."""
    return store.feats if hasattr(store, "feats") else store.samples


def _align_flat_1d(
    flat: np.ndarray, sizes: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Re-lay a contiguous 1-D corpus with ``_ALIGN``-sample clip slots
    (zero fill, offsets all multiples of ``_ALIGN``; total also padded to
    a block multiple). Costs <= 127 samples per clip (~0.2% at 4 s clips)
    and buys the block-gather fast path."""
    sizes64 = np.asarray(sizes, np.int64)
    slots = (sizes64 + _ALIGN - 1) // _ALIGN * _ALIGN
    offsets = np.concatenate([[0], np.cumsum(slots)[:-1]])
    total = int(slots.sum())
    if total >= 2**31:
        raise ValueError(
            f"corpus too large for int32 addressing after {_ALIGN}-sample "
            f"slot alignment ({total} rows)"
        )
    src = np.concatenate([[0], np.cumsum(sizes64)[:-1]])
    out = np.zeros(total, flat.dtype)
    for i in range(len(sizes64)):
        n = int(sizes64[i])
        out[offsets[i] : offsets[i] + n] = flat[src[i] : src[i] + n]
    return out, offsets.astype(np.int32)


def resident_from_store(
    store,
    mesh=None,
    dtype: Optional[str] = None,
    labeled: bool = True,
) -> ResidentClips:
    """Commits a WavStore / FeatureStore (or a subset view) to device memory,
    replicated over ``mesh`` when given.

    ``dtype``: optional storage dtype for ``flat``. bfloat16 is LOSSLESS for
    features produced by a bfloat16 encoder (the f32 values are
    bf16-representable) and halves HBM; leave None (float32) for exactness
    with f32 pipelines.
    """
    flat, offsets, sizes = _compact(store)
    if flat.ndim == 1:
        flat, offsets = _align_flat_1d(flat, sizes)
    if dtype is not None:
        flat = flat.astype(dtype)
    labels = (
        np.asarray(store.labels, np.int32)
        if labeled and store.labels is not None
        else np.full(store.num, -1, np.int32)
    )
    put = (
        (lambda x: jax.device_put(jnp.asarray(x), replicated(mesh)))
        if mesh is not None
        else (lambda x: jax.device_put(jnp.asarray(x)))
    )
    res = ResidentClips(
        flat=put(flat), offsets=put(offsets), sizes=put(sizes),
        labels=put(labels),
    )
    logger.info(
        "resident corpus: %d clips, %.1f MB %s committed to device",
        store.num, flat.nbytes / 1e6, flat.dtype,
    )
    return res


def resident_from_flat(
    flat: np.ndarray,
    sizes: np.ndarray,
    labels: Optional[np.ndarray] = None,
    mesh=None,
) -> ResidentClips:
    """Commits an already-flat clip corpus ((total[, D]) + per-clip sizes)
    to device memory — the constructor for corpora that never lived in a
    FeatureStore/WavStore (e.g. the d2v pretraining wav corpus, which
    WavCropDataset.load_all_audio decodes straight to a flat array)."""
    sizes64 = np.asarray(sizes, np.int64)
    total = int(sizes64.sum())
    if total >= 2**31:
        raise ValueError(f"corpus too large for int32 addressing ({total} rows)")
    if total != len(flat):
        raise ValueError(f"flat length {len(flat)} != sizes sum {total}")
    if np.ndim(flat) == 1:
        flat, offsets = _align_flat_1d(np.asarray(flat), sizes64)
    else:
        offsets = np.concatenate([[0], np.cumsum(sizes64)[:-1]]).astype(
            np.int32
        )
    if labels is None:
        labels = np.full(len(sizes64), -1, np.int32)
    put = (
        (lambda x: jax.device_put(jnp.asarray(x), replicated(mesh)))
        if mesh is not None
        else (lambda x: jax.device_put(jnp.asarray(x)))
    )
    res = ResidentClips(
        flat=put(flat), offsets=put(offsets),
        sizes=put(sizes64.astype(np.int32)), labels=put(labels),
    )
    logger.info(
        "resident corpus: %d clips, %.1f MB %s committed to device",
        len(sizes64), flat.nbytes / 1e6, flat.dtype,
    )
    return res


def resident_nbytes(store, dtype: Optional[str] = None) -> int:
    """Upload size estimate without building anything."""
    itemsize = np.dtype(dtype).itemsize if dtype else store_flat(store).itemsize
    width = 1 if store_flat(store).ndim == 1 else store_flat(store).shape[1]
    return int(np.asarray(store.sizes, np.int64).sum()) * width * itemsize


def gather_clips(c: ResidentClips, idx: jax.Array, t: int,
                 frame_cap: Optional[int] = None,
                 starts: Optional[jax.Array] = None,
                 starts_aligned: bool = False):
    """Assemble the padded (B, t[, D]) batch for clip indices ``idx``
    (int32, -1 = padded row) — the on-device equivalent of
    PaddedBatchIterator/PaddedWavIterator row assembly: clips truncated to
    ``t`` (and ``frame_cap``), zero pad fill, mask True = pad.

    ``starts`` ((B,) int32, optional): per-row read offset WITHIN each
    clip — the fixed-size random-crop case (d2v pretraining's
    WavCropDataset row assembly): row b reads clip idx[b] samples
    [starts[b], starts[b] + t). Rows whose clip is shorter than ``t``
    use starts[b] == 0 and pad, exactly like the host crop loop.

    ``starts_aligned`` (static): caller's guarantee that every start is a
    multiple of ``_ALIGN`` (crop_align-quantized draws) — enables the
    block fast path for crop gathers too. Values are NOT checked under
    jit; an unaligned start with this flag set reads shifted samples."""
    safe = jnp.maximum(idx, 0)
    off = c.offsets[safe]
    sz = c.sizes[safe]
    if starts is not None:
        off = off + starts
        sz = sz - starts  # samples remaining from the crop start
    pos_t = jnp.arange(t, dtype=jnp.int32)
    valid = (pos_t[None, :] < sz[:, None]) & (idx >= 0)[:, None]
    if frame_cap is not None and t > frame_cap:
        valid = valid & (pos_t[None, :] < frame_cap)
    if (
        c.flat.ndim == 1
        and (starts is None or starts_aligned)
        and t % _ALIGN == 0
        and c.flat.shape[0] % _ALIGN == 0
        and c.flat.shape[0] > 0
    ):
        # block fast path: 1-D corpora are slot-aligned by construction
        # (offsets all multiples of _ALIGN), so each output row is
        # t/_ALIGN whole 128-sample blocks. The element-wise take below
        # lowers to a scalar HBM gather that measured 0.1 GB/s on v5e —
        # 490 ms for one 64 x 16 s batch, more than the entire encoder
        # step — while this row gather runs at memory speed. Rows past a
        # clip's slot read the next clip's data and are zeroed by
        # ``valid``; the clamp guards the corpus tail.
        n_blocks = c.flat.shape[0] // _ALIGN
        blk = c.flat.reshape(n_blocks, _ALIGN)
        rows = off[:, None] // _ALIGN + jnp.arange(
            t // _ALIGN, dtype=jnp.int32
        )[None, :]
        rows = jnp.minimum(rows, n_blocks - 1)
        out = jnp.take(blk, rows, axis=0).reshape(idx.shape[0], t)
        out = jnp.where(valid, out, jnp.zeros((), out.dtype))
        return out, ~valid
    pos = off[:, None] + jnp.minimum(
        pos_t[None, :], jnp.maximum(sz[:, None] - 1, 0)
    )
    out = jnp.take(c.flat, pos, axis=0)
    vmask = valid if out.ndim == 2 else valid[..., None]
    out = jnp.where(vmask, out, jnp.zeros((), out.dtype))
    return out, ~valid


def index_batches(it, epoch: int) -> Iterator[Tuple[np.ndarray, int]]:
    """The INDEX-ONLY projection of a PaddedBatchIterator / PaddedWavIterator
    epoch: yields (padded_idx (B,) int32 with -1 pad rows, bucket length T)
    for exactly the batches the iterator itself would assemble — same
    (seed, epoch) shuffle stream, same bucket snap, same max_frames cap
    (tests pin this against the real iterators)."""
    it.set_epoch(epoch)
    sizes = np.asarray(it.store.sizes)
    max_frames = getattr(it, "max_frames", None)
    order = epoch_order(
        len(sizes),
        shuffle=it.shuffle,
        seed=it.seed,
        epoch=it.epoch,
        bucket_shuffle=getattr(it, "bucket_shuffle", False),
        sizes=sizes,
        buckets=it.buckets,
        batch_size=it.batch_size,
        max_frames=max_frames,
    )
    B = it.batch_size
    for start in range(0, len(order), B):
        idx = order[start : start + B]
        t_max = int(sizes[idx].max()) if len(idx) else 1
        if max_frames is not None:
            t_max = min(t_max, max_frames)
        T = pad_to_bucket(t_max, it.buckets)
        padded = np.full(B, -1, np.int32)
        padded[: len(idx)] = idx
        yield padded, T


def paired_index_epoch(clean_it, noisy_it, epoch: int):
    """Index-only paired_epoch (data/batching.py): zips the two streams for
    one epoch, truncated to the shorter (reference train.py:479-483)."""
    n = min(len(clean_it), len(noisy_it))
    ci = index_batches(clean_it, epoch)
    ni = index_batches(noisy_it, epoch)
    for _ in range(n):
        yield next(ci), next(ni)


def gather_feature_batch(
    c: ResidentClips, idx: jax.Array, t: int,
    frame_cap: Optional[int] = None,
) -> Batch:
    """On-device assembly of a feature-mode ``Batch`` — the resident
    counterpart of PaddedBatchIterator row assembly (data/batching.py:
    zero pad fill, True=pad mask, -1 labels/ids on padded rows, frame
    cap), bit-identical to the host rows for the same indices."""
    feats, pad = gather_clips(c, idx, t, frame_cap)
    labels = jnp.where(idx >= 0, c.labels[jnp.maximum(idx, 0)], -1)
    return Batch(
        feats=feats.astype(jnp.float32),
        padding_mask=pad,
        labels=labels,
        ids=idx,
        row_valid=idx >= 0,
    )


def materialize_metrics(per_step, keys) -> np.ndarray:
    """ONE host transfer for an epoch's deferred per-step metric scalars.

    Each ``float(metrics[k])`` is its own device->host round trip; on a
    tunnel-attached chip that latency (not bytes) dominates a resident
    epoch's wall time (PERFORMANCE.md round 4). Stacking the S*len(keys)
    scalars on device and pulling once replaces S*K round trips with one.
    Returns (S, K) float32 — exactly the values the per-step float() calls
    would have produced, in the same order."""
    if not per_step:
        return np.zeros((0, len(keys)), np.float32)
    stacked = jnp.stack(
        [
            jnp.stack([jnp.asarray(m[k], jnp.float32) for k in keys])
            for m in per_step
        ]
    )
    return np.asarray(stacked)


def materialize_tracking(per_step) -> list:
    """One host transfer PER TRACKING KEY (not per step) for an epoch's
    deferred tracking dicts; returns per-step host dicts in step order."""
    if not per_step:
        return []
    keys = list(per_step[0])
    host = {
        k: np.asarray(jnp.stack([t[k] for t in per_step])) for k in keys
    }
    return [{k: host[k][i] for k in keys} for i in range(len(per_step))]


def make_resident_d2v_step(model, tx):
    """The d2v pretraining train step with an on-device crop-gather
    prologue — the resident counterpart of the WavCropDataset.batches host
    loop (train/d2v_pretrain.py) feeding make_d2v_train_step:

    step(state, corpus, idx, starts, key, *, crop) -> (state', metrics)

    ``idx``/``starts`` are (B,) int32 (global clip index, crop offset
    within the clip) — together ~KB/step of host->device traffic instead
    of the (B, crop) f32 wav batch (~10 MB/step at upstream shapes), which
    PERFORMANCE.md round 3 measured as the d2v DRIVER's entire overhead
    over its own device step (283 vs 212 ms/step). The corpus is committed
    once with pcfg.normalize already applied on host (normalization is
    whole-CLIP, so it is crop-invariant and can be precomputed), making
    the gathered (wav, pad) batch bit-identical to the streamed one for
    the same (idx, starts) (tests/test_d2v_pretrain.py pins it). The
    reference's dataset feeds from RAM (upstream/tasks/
    audio_pretraining.py:28-263); ours feeds from HBM."""
    from ..models.d2v_pretrain import make_d2v_train_step

    core = make_d2v_train_step(model, tx, jit=False)

    def step(state, corpus: ResidentClips, idx, starts, key, *,
             crop: int, starts_aligned: bool = False):
        # starts_aligned: pcfg.crop_align % 128 == 0 quantizes every crop
        # offset onto the block grid, switching the gather from the
        # element path (0.1 GB/s at IEMOCAP-size corpora — 98.7 ms of a
        # ~220 ms step; PERFORMANCE.md round 5) to whole-block rows
        wav, pad = gather_clips(corpus, idx, crop, starts=starts,
                                starts_aligned=starts_aligned)
        return core(state, wav.astype(jnp.float32), pad, key)

    return jax.jit(step, static_argnames=("crop", "starts_aligned"),
                   donate_argnums=(0,))


def make_resident_dad_step(head, tx, cfg):
    """The feature-mode DAD train step with an on-device batch-gather
    prologue (the CrossDomainTrainer analogue of make_resident_fused_step):

    step(state, clean_corpus, noisy_corpus, clean_idx, noisy_idx, scalars,
         anchors, key, *, t_clean, t_noisy, frame_cap) -> (state', metrics,
         tracking)

    Per step the host ships two (B,) int32 index vectors + the key instead
    of ~MBs of 768-d feature rows that are STATIC for the whole run.
    Batches are gathered at each batch's own bucket shape (static
    t_clean/t_noisy), so the loss/update/dropout numerics are EXACTLY the
    streaming per-batch path's (tests/test_fused_trainer.py pins it)."""
    from ..dad.train_step import make_dad_train_step

    core = make_dad_train_step(head, tx, cfg)

    def step(state, clean_c: ResidentClips, noisy_c: ResidentClips,
             clean_idx, noisy_idx, scalars, anchors, key,
             *, t_clean: int, t_noisy: int,
             frame_cap: Optional[int] = None):
        clean = gather_feature_batch(clean_c, clean_idx, t_clean, frame_cap)
        noisy = gather_feature_batch(noisy_c, noisy_idx, t_noisy, frame_cap)
        return core(state, clean, noisy, scalars, anchors, key)

    return jax.jit(
        step,
        static_argnames=("t_clean", "t_noisy", "frame_cap"),
        donate_argnums=(0,),
    )


def make_resident_dad_epoch_runner(head, tx, cfg):
    """Chunked lax.scan over an HBM-resident feature corpus — the resident
    counterpart of dad/epoch_scan.make_dad_epoch_runner: ONE dispatch per
    scan chunk AND ~KB of host traffic per chunk.

    run(state, clean_corpus, noisy_corpus, clean_idx (S,B), noisy_idx (S,B),
        scalars, anchors, key, *, t_pad, frame_cap) -> (state',
        metrics_mean, tracking_stacked)

    ``t_pad`` is the chunk-common frame count — both streams pad to it,
    exactly like epoch_scan.stack_batches pads a streamed chunk, and the
    key splits into S per-step keys exactly like make_dad_epoch_runner, so
    this path reproduces the streamed scan_chunk path's numerics."""
    from ..dad.train_step import make_dad_train_step

    core = make_dad_train_step(head, tx, cfg)

    def run(state, clean_c: ResidentClips, noisy_c: ResidentClips,
            clean_idx, noisy_idx, scalars, anchors, key,
            *, t_pad: int, frame_cap: Optional[int] = None):
        def body(carry, xs):
            st = carry
            ci, ni, k = xs
            clean = gather_feature_batch(clean_c, ci, t_pad, frame_cap)
            noisy = gather_feature_batch(noisy_c, ni, t_pad, frame_cap)
            st2, metrics, tracking = core(st, clean, noisy, scalars,
                                          anchors, k)
            return st2, (metrics, tracking)

        S = clean_idx.shape[0]
        keys = jax.random.split(key, S)
        state, (metrics, tracking) = jax.lax.scan(
            body, state, (clean_idx, noisy_idx, keys)
        )
        return state, jax.tree.map(jnp.mean, metrics), tracking

    return jax.jit(
        run,
        static_argnames=("t_pad", "frame_cap"),
        donate_argnums=(0,),
    )


def _gather_fused_pair(clean_c: ResidentClips, wav_c: ResidentClips,
                       clean_idx, noisy_idx, t_clean: int, t_wav: int,
                       frame_cap, mesh, dp2, dp3):
    """On-device assembly of one fused (clean features, noisy wavs) batch
    pair from HBM-resident corpora — the shared prologue of
    make_resident_fused_step and make_resident_fused_epoch_runner."""
    feats, fmask = gather_clips(clean_c, clean_idx, t_clean, frame_cap)
    feats = feats.astype(jnp.float32)
    labels = jnp.where(
        clean_idx >= 0, clean_c.labels[jnp.maximum(clean_idx, 0)], -1
    )
    wav, wmask = gather_clips(wav_c, noisy_idx, t_wav)
    if mesh is not None:
        feats = jax.lax.with_sharding_constraint(feats, dp3)
        fmask = jax.lax.with_sharding_constraint(fmask, dp2)
        wav = jax.lax.with_sharding_constraint(wav, dp2)
        wmask = jax.lax.with_sharding_constraint(wmask, dp2)
    clean = CleanFeatureBatch(
        feats=feats, frame_mask=fmask, labels=labels,
        row_valid=clean_idx >= 0,
    )
    noisy = FusedBatch(
        wav=wav.astype(jnp.float32), wav_mask=wmask,
        labels=jnp.full_like(noisy_idx, -1),
        row_valid=noisy_idx >= 0,
        ids=noisy_idx,
    )
    return clean, noisy


def make_resident_fused_step(
    encoder,
    head,
    tx,
    cfg: FusedConfig,
    mesh=None,
):
    """The fused cached-clean step with an on-device batch-gather prologue:

    step(enc_params, state, clean_corpus, wav_corpus, clean_idx, noisy_idx,
         scalars, anchors, key[, noise_bank], *, t_clean, t_wav[, frame_cap])
    -> (state', metrics)

    ``clean_idx``/``noisy_idx`` are (B,) int32 clip indices (-1 = padded
    row) — the only per-step host->device traffic besides the key/scalars.
    One compile per (t_clean, t_wav) bucket pair, exactly like the
    streaming step's batch shapes.
    """
    if not cfg.cache_clean_features:
        raise ValueError("resident mode requires cache_clean_features "
                         "(the production fused-trainer configuration)")
    core = build_fused_step(encoder, head, tx, cfg)
    dp2 = batch_sharding(mesh, 2) if mesh is not None else None
    dp3 = batch_sharding(mesh, 3) if mesh is not None else None

    def step(enc_params, state, clean_c: ResidentClips, wav_c: ResidentClips,
             clean_idx, noisy_idx, scalars, anchors, key, noise_bank=None,
             *, t_clean: int, t_wav: int, frame_cap: Optional[int] = None):
        clean, noisy = _gather_fused_pair(
            clean_c, wav_c, clean_idx, noisy_idx, t_clean, t_wav, frame_cap,
            mesh, dp2, dp3,
        )
        return core(enc_params, state, clean, noisy, scalars, anchors, key,
                    noise_bank)

    return jax.jit(
        step,
        static_argnames=("t_clean", "t_wav", "frame_cap"),
        donate_argnums=(1,),
    )


def make_resident_fused_epoch_runner(
    encoder,
    head,
    tx,
    cfg: FusedConfig,
    mesh=None,
):
    """Chunked lax.scan over the fused wav->train step with HBM-resident
    corpora — ONE dispatch (and ~KB of host traffic) per scan chunk instead
    of one per step.

    run(enc_params, state, clean_corpus, wav_corpus, clean_idx (S,B),
        noisy_idx (S,B), scalars, anchors, key[, noise_bank],
        *, t_clean, t_wav[, frame_cap]) -> (state', metrics_stacked)

    The per-step resident path still pays ~3-4 dispatch round trips per step
    (key split, index upload, step call), which on a tunnel-attached chip is
    ~0.1 s of pure latency against ~33 ms of device math (PERFORMANCE.md
    round 4) — the same diagnosis dad/epoch_scan.py makes for the
    feature-level step. Scanning S steps in one XLA program amortizes that
    to ~4 RPCs per chunk. Every step in the chunk pads to the chunk-common
    (t_clean, t_wav) buckets (both are maxima of bucket-snapped values, so
    the compile-count bound is the bucket table's), and the chunk key splits
    into S per-step keys exactly like make_dad_epoch_runner / the resident
    feature runner; scan-of-1 therefore differs from the per-step path only
    in the key derivation. metrics come back stacked (S, ...) so the
    trainer's epoch averages see exactly the per-step values.
    """
    if not cfg.cache_clean_features:
        raise ValueError("resident mode requires cache_clean_features "
                         "(the production fused-trainer configuration)")
    core = build_fused_step(encoder, head, tx, cfg)
    dp2 = batch_sharding(mesh, 2) if mesh is not None else None
    dp3 = batch_sharding(mesh, 3) if mesh is not None else None

    def run(enc_params, state, clean_c: ResidentClips, wav_c: ResidentClips,
            clean_idx, noisy_idx, scalars, anchors, key, noise_bank=None,
            *, t_clean: int, t_wav: int, frame_cap: Optional[int] = None):
        def body(carry, xs):
            st = carry
            ci, ni, k = xs
            clean, noisy = _gather_fused_pair(
                clean_c, wav_c, ci, ni, t_clean, t_wav, frame_cap,
                mesh, dp2, dp3,
            )
            st2, metrics = core(enc_params, st, clean, noisy, scalars,
                                anchors, k, noise_bank)
            return st2, metrics

        S = clean_idx.shape[0]
        keys = jax.random.split(key, S)
        state, metrics = jax.lax.scan(
            body, state, (clean_idx, noisy_idx, keys)
        )
        return state, metrics

    return jax.jit(
        run,
        static_argnames=("t_clean", "t_wav", "frame_cap"),
        donate_argnums=(1,),
    )


def materialize_chunked_metrics(per_chunk, keys) -> np.ndarray:
    """materialize_metrics for scan chunks: each entry holds (S_chunk,)
    stacked metric arrays; returns (S_total, K) float32 in step order with
    ONE device->host transfer."""
    if not per_chunk:
        return np.zeros((0, len(keys)), np.float32)
    cat = jnp.stack(
        [
            jnp.concatenate(
                [jnp.asarray(m[k], jnp.float32).reshape(-1) for m in per_chunk]
            )
            for k in keys
        ],
        axis=1,
    )
    return np.asarray(cat)
