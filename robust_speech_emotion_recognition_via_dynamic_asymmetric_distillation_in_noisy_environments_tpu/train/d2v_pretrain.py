"""Self-supervised d2v pretraining driver — the counterpart of the fairseq
``Emotion2vecPretrainingTask`` (reference upstream/tasks/
audio_pretraining.py:28-263) plus the update loop fairseq-hydra runs around
it.

Dataset: manifest-driven raw wavs (``FileAudioDataset`` analogue,
audio_pretraining.py:129-148) with FIXED random crops so every step compiles
to one static XLA program; multiple manifests mix like
``MultiCorpusDataset`` (audio_pretraining.py:150-199) via per-corpus sampling
weights. Short clips are padded and masked. The loop runs the jitted d2v
step (models/d2v_pretrain.py), monitors the variance collapse guards
(reference config.py:77-83), checkpoints the full train state, and exports
the encoder subtree in the layout the extraction encoder loads directly.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np

from ..configs import D2vPretrainConfig, EncoderConfig
from ..data.manifests import read_manifest
from ..data.prefetch import prefetch
from ..audio.wavio import read_mono
from ..utils import dump_json, get_logger

logger = get_logger(__name__)


def _normalize_clip(wav: np.ndarray) -> np.ndarray:
    """Whole-crop layer norm (task.cfg.normalize — the same preprocessing the
    extraction CLI applies, emotion2vec_speech_features.py:69-70)."""
    mu = wav.mean()
    var = wav.var()
    return (wav - mu) / np.sqrt(var + 1e-5)


class WavCropDataset:
    """Random fixed-size crops over one or more wav manifests.

    ``weights`` scale how much of each corpus an epoch sees, mirroring
    MultiCorpusDataset's fractional sampling: the integer part repeats the
    corpus whole, and the fractional part draws a seeded per-epoch subset of
    that fraction of its clips (so ``[1.0, 0.1]`` really down-samples corpus
    2 to ~10% per epoch instead of rounding it up to a full repeat)."""

    def __init__(
        self,
        manifest_dirs: Sequence[str],
        pcfg: D2vPretrainConfig,
        split: str = "train",
        weights: Optional[Sequence[float]] = None,
    ):
        self.pcfg = pcfg
        self.base_lists: List[List[Tuple[str, int]]] = []
        for d in manifest_dirs:
            root, files = read_manifest(d, split)
            kept = [
                (os.path.join(root, rel), frames)
                for rel, frames in files
                if frames < 0 or frames >= pcfg.min_sample_size
            ]
            skipped = len(files) - len(kept)
            if skipped:
                logger.info(
                    "%s: skipped %d clips under min_sample_size=%d",
                    d, skipped, pcfg.min_sample_size,
                )
            self.base_lists.append(kept)
        self._init_weights(weights)

    def _init_weights(self, weights: Optional[Sequence[float]]) -> None:
        if weights is None:
            weights = [1.0] * len(self.base_lists)
        if any(w <= 0 for w in weights):
            raise ValueError(f"sampling weights must be positive: {weights}")
        self.weights = [float(w) for w in weights]
        # flat global clip index space (resident mode addresses clips by
        # these): corpus ci's clip j is global index _corpus_starts[ci] + j
        self._flat_entries = [e for lst in self.base_lists for e in lst]
        self._corpus_starts = np.concatenate(
            [[0], np.cumsum([len(lst) for lst in self.base_lists])]
        ).astype(np.int64)
        if not self.files_for_epoch(0):
            raise ValueError("no usable clips in the given manifests")

    def _load_audio(self, entry: Tuple[str, int]) -> np.ndarray:
        """(path, frames) manifest entry -> mono float32 at the task sample
        rate. Subclasses (data/binarized.py) override this to read from a
        packed store instead of parsing wav files."""
        path, _frames = entry
        return read_mono(path, self.pcfg.sample_rate)

    def indices_for_epoch(self, epoch: int) -> np.ndarray:
        """Epoch composition as GLOBAL clip indices (into the flat
        per-corpus-concatenated clip space) — the single source of truth
        behind files_for_epoch, shared with the resident index projection
        (index_crop_batches) so both paths see the identical epoch."""
        out: List[int] = []
        for ci, (lst, w) in enumerate(zip(self.base_lists, self.weights)):
            base = int(self._corpus_starts[ci])
            reps, frac = int(w), w - int(w)
            for _ in range(reps):
                out.extend(range(base, base + len(lst)))
            n_frac = int(round(frac * len(lst)))
            if n_frac:
                rng = np.random.default_rng(
                    (self.pcfg.random_seed, epoch, ci)
                )
                pick = rng.choice(len(lst), n_frac, replace=False)
                out.extend(base + int(i) for i in pick)
        return np.asarray(out, np.int64)

    def files_for_epoch(self, epoch: int) -> List[Tuple[str, int]]:
        return [
            self._flat_entries[int(g)] for g in self.indices_for_epoch(epoch)
        ]

    def load_all_audio(self) -> Tuple[np.ndarray, np.ndarray]:
        """Decodes every UNIQUE clip once — normalized exactly like
        ``batches()`` (whole-clip, crop-invariant) — into one flat float32
        array; returns (flat (total,), sizes (N,) int64) in global-index
        order. This is the host side of the device-resident corpus: the
        streaming path re-decodes every wav each epoch, so one decode pass
        costs no more than one streamed epoch."""
        sizes = np.empty(len(self._flat_entries), np.int64)
        clips: List[np.ndarray] = []
        for gi, entry in enumerate(self._flat_entries):
            audio = np.asarray(self._load_audio(entry), np.float32)
            if self.pcfg.normalize:
                audio = _normalize_clip(audio)
            sizes[gi] = len(audio)
            clips.append(audio)
        flat = (
            np.concatenate(clips) if clips else np.zeros(0, np.float32)
        )
        return flat, sizes

    def estimated_audio_nbytes(self) -> int:
        """Resident-commit size estimate WITHOUT decoding: the manifest
        frames column (f32 samples), with unknown (-1) frames counted as
        one crop — a floor, good enough for the resident budget guard."""
        total = 0
        for entry in self._flat_entries:
            _key, frames = entry
            total += int(frames) if frames >= 0 else self.pcfg.crop_size
        return total * 4

    def __len__(self) -> int:
        return len(self.files_for_epoch(0))

    def num_batches(self, batch_size: int, epoch: int = 0) -> int:
        # drop_last (fairseq default)
        return len(self.files_for_epoch(epoch)) // batch_size

    def batches(
        self, epoch: int, batch_size: int, skip: int = 0
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yields (wav (B, crop) f32, padding_mask (B, crop) bool).

        ``skip`` drops the first N batches without reading their wavs (used
        by resume to re-enter mid-epoch at the right position)."""
        pcfg = self.pcfg
        crop = pcfg.crop_size
        files = self.files_for_epoch(epoch)
        rng = np.random.default_rng((pcfg.random_seed, epoch))
        order = rng.permutation(len(files))
        n_use = self.num_batches(batch_size, epoch) * batch_size
        for start in range(skip * batch_size, n_use, batch_size):
            idx = order[start : start + batch_size]
            # crop offsets keyed by (seed, epoch, batch index) — position-
            # independent draws, so a mid-epoch resume (skip > 0) replays
            # exactly the batches the uninterrupted run would have produced
            rng = np.random.default_rng(
                (pcfg.random_seed, epoch, start // batch_size)
            )
            wav = np.zeros((batch_size, crop), np.float32)
            pad = np.ones((batch_size, crop), bool)
            for row, i in enumerate(idx):
                audio = self._load_audio(files[int(i)])
                # fairseq RawAudioDataset normalizes the FULL clip in
                # __getitem__ and crops in the collater — matching the
                # extraction path, which also normalizes whole clips
                if pcfg.normalize:
                    audio = _normalize_clip(audio)
                n = len(audio)
                if n > crop:
                    # floored to the crop_align grid AFTER the draw so the
                    # rng stream consumption matches index_crop_batches
                    s = int(rng.integers(0, n - crop + 1))
                    s -= s % pcfg.crop_align
                    clip = audio[s : s + crop]
                    n = crop
                else:
                    clip = audio
                wav[row, :n] = clip
                pad[row, :n] = False
            yield wav, pad


def index_crop_batches(
    ds: WavCropDataset,
    epoch: int,
    batch_size: int,
    sizes: np.ndarray,
    skip: int = 0,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """The INDEX-ONLY projection of ``WavCropDataset.batches``: yields
    (idx (B,) int32 global clip indices, starts (B,) int32 crop offsets)
    for exactly the batches the streaming iterator would assemble — same
    epoch composition (indices_for_epoch), same (seed, epoch) shuffle
    permutation, same per-batch crop rng keyed by (seed, epoch, batch),
    consumed ONLY for rows whose clip exceeds the crop, in row order —
    the streaming loop's exact draw sequence (tests pin the resulting
    batches bit-identical).

    ``sizes``: TRUE per-clip sample counts in global-index order (from
    load_all_audio) — the crop draw range is the real clip length, which
    manifests may not know (frames can be -1/stale)."""
    pcfg = ds.pcfg
    crop = pcfg.crop_size
    gidx = ds.indices_for_epoch(epoch)
    rng = np.random.default_rng((pcfg.random_seed, epoch))
    order = rng.permutation(len(gidx))
    n_use = (len(gidx) // batch_size) * batch_size  # drop_last
    for start in range(skip * batch_size, n_use, batch_size):
        rows = order[start : start + batch_size]
        rng = np.random.default_rng(
            (pcfg.random_seed, epoch, start // batch_size)
        )
        idx = np.empty(batch_size, np.int32)
        starts = np.zeros(batch_size, np.int32)
        for row, i in enumerate(rows):
            g = int(gidx[int(i)])
            idx[row] = g
            n = int(sizes[g])
            if n > crop:
                s = int(rng.integers(0, n - crop + 1))
                starts[row] = s - s % pcfg.crop_align
        yield idx, starts


def run_d2v_pretrain(
    cfg: EncoderConfig,
    pcfg: D2vPretrainConfig,
    manifest_dirs: Sequence[str],
    save_dir: str,
    weights: Optional[Sequence[float]] = None,
    init_checkpoint: Optional[str] = None,
    log_every: int = 50,
    checkpoint_every: int = 1000,
    resume: bool = False,
    mesh=None,
    binarized: bool = False,
    transfer_dtype: Optional[str] = None,
    scan_chunk: int = 1,
    valid_manifests: Optional[Sequence[str]] = None,
    valid_split: str = "valid",
    valid_every: int = 1000,
    resident="off",
    resident_max_bytes: int = 8 << 30,
) -> Dict:
    """Runs ``pcfg.max_steps`` updates; returns the final metric dict.

    ``init_checkpoint``: optional ``emotion2vec_base.pt`` (or flax msgpack)
    to continue pretraining from.

    ``mesh`` (jax.sharding.Mesh): dp-shard every batch over the mesh
    (parallel/d2v_sharded.py) — numerically the single-device step on the
    same global batch. batch_size must divide by the dp extent.

    ``transfer_dtype`` (e.g. "bfloat16"): ship wav batches to the device in
    the narrower dtype and cast back on-device (prefetch transfer_fp32_as)
    — halves the per-step host->device bytes, which dominates on a
    thin-link attach; quantizes the waveform to bf16 precision (opt-in,
    same contract as the fused trainer's --transfer-dtype). Single-device
    only (with a mesh the sharded step places batches itself).

    ``scan_chunk``: advance this many updates per XLA dispatch
    (lax.scan-stacked steps, models/d2v_pretrain.py:make_d2v_chunk_runner
    — the d2v analogue of the DAD trainer's --scan-chunk). Bit-identical
    to per-step execution (the chunk consumes the same iterated key
    stream); collapse-guard detection lags by up to 2*scan_chunk-1
    updates. Single-device only.

    ``valid_manifests``: the fairseq periodic-validation analogue — every
    ``valid_every`` steps (and at the end) the masked objective runs over
    ``<dir>/<valid_split>.tsv`` with dropout off and a FIXED key/crop
    stream (comparable across passes); valid_loss entries land in the
    history, the best state is kept as ``d2v_best_state.msgpack``, and
    its encoder subtree is exported as ``encoder_params_best.msgpack``.

    ``resident``: True / False / "auto" — decode + commit the (normalized)
    training audio to DEVICE memory once and gather each step's fixed-size
    crops on-device from per-step (clip, start) index vectors
    (parallel/resident.py make_resident_d2v_step) instead of uploading a
    ~10 MB wav batch every step; losses are bit-identical to streaming
    under the shared crop-index stream (tested). "auto" engages when the
    size estimate fits ``resident_max_bytes`` (and int32 addressing);
    single-device per-step only — a mesh streams (the sharded step places
    batches itself), and scan_chunk > 1 falls back to the streamed scan
    ("auto") or raises (explicit True): resident per-step dispatch is
    already fully async, so there is no latency left for scan to amortize
    (same finding as the fused trainer's round-4 default).
    ``transfer_dtype`` is inert in resident mode (no wav transfers)."""
    from ..models.d2v_pretrain import (
        D2vTrainState,
        encoder_params,
        init_d2v_state,
        split_chunk_keys,
    )
    from .checkpointing import restore_train_state, save_train_state

    os.makedirs(save_dir, exist_ok=True)
    model, tx, state = init_d2v_state(
        cfg, pcfg, jax.random.PRNGKey(pcfg.random_seed),
        example_len=pcfg.crop_size,
    )
    if init_checkpoint:
        from ..models.convert import load_emotion2vec_checkpoint
        from ..models.d2v_pretrain import init_ema_blocks

        enc = load_emotion2vec_checkpoint(init_checkpoint, cfg)
        merged = dict(state.params["params"])
        merged.update(enc["params"])
        params = {"params": merged}
        state = state._replace(
            params=params, ema_blocks=init_ema_blocks(params, cfg, pcfg)
        )
        logger.info("initialized encoder from %s", init_checkpoint)

    if mesh is not None and transfer_dtype:
        # don't silently drop a requested perf flag (same contract as
        # prefetch(depth<=0))
        logger.warning(
            "transfer_dtype=%s ignored: the mesh-sharded step places "
            "batches itself", transfer_dtype,
        )
    if mesh is not None and scan_chunk > 1:
        logger.warning(
            "scan_chunk=%d ignored under a mesh (per-batch dispatch)",
            scan_chunk,
        )
    chunk = 1
    chunk_runner = None
    if mesh is not None:
        from ..parallel.d2v_sharded import make_sharded_d2v_step, place_d2v_state

        dp = mesh.shape.get("dp", 1)
        if pcfg.batch_size % dp:
            raise ValueError(
                f"batch_size={pcfg.batch_size} must divide by dp={dp}"
            )
        state = place_d2v_state(state, mesh)
        step_fn = make_sharded_d2v_step(model, tx, mesh)
    elif scan_chunk > 1:
        from ..models import d2v_pretrain as _d2v_models

        chunk = scan_chunk
        step_fn = None
        chunk_runner = _d2v_models.make_d2v_chunk_runner(model, tx)
    else:
        # resolved through the module so test instrumentation
        # (monkeypatched step factories) keeps working
        from ..models import d2v_pretrain as _d2v_models

        step_fn = _d2v_models.make_d2v_train_step(model, tx)
    if binarized:
        from ..data.binarized import BinarizedWavDataset

        ds = BinarizedWavDataset(manifest_dirs, pcfg, weights=weights)
    else:
        ds = WavCropDataset(manifest_dirs, pcfg, weights=weights)
    logger.info(
        "d2v pretrain: %d clips, %d steps/epoch, %d total steps",
        len(ds), ds.num_batches(pcfg.batch_size), pcfg.max_steps,
    )

    # device-resident corpus (see docstring): resolve the mode, then decode
    # + commit once and build the gather step
    use_resident = resident not in (False, "off", None)
    if use_resident and mesh is not None:
        logger.warning(
            "resident corpus ignored under a mesh (the dp-sharded step "
            "places batches itself)"
        )
        use_resident = False
    if use_resident and scan_chunk > 1:
        if resident is True:
            raise ValueError(
                "resident mode is per-step only (its dispatch is already "
                "fully async; PERFORMANCE.md round 4) — pass scan_chunk<=1"
            )
        logger.info(
            "resident auto disabled: scan_chunk=%d requested", scan_chunk
        )
        use_resident = False
    resident_corpus = None
    res_sizes = None
    if use_resident:
        est = ds.estimated_audio_nbytes()
        if resident == "auto" and est > resident_max_bytes:
            logger.info(
                "resident corpus disabled: estimated %.1f GB > budget "
                "%.1f GB", est / 1e9, resident_max_bytes / 1e9,
            )
            use_resident = False
    if use_resident:
        from ..parallel.resident import (
            make_resident_d2v_step,
            resident_from_flat,
        )

        flat, res_sizes = ds.load_all_audio()
        if resident == "auto" and (
            flat.nbytes > resident_max_bytes or len(flat) >= 2**31
        ):
            # the decoded truth can exceed the manifest-frames estimate
            logger.info(
                "resident corpus disabled post-decode: %.1f GB > budget "
                "(or int32 overflow)", flat.nbytes / 1e9,
            )
            use_resident = False
            flat = None
        else:
            resident_corpus = resident_from_flat(flat, res_sizes)
            flat = None  # host copy no longer needed
            resident_step = make_resident_d2v_step(model, tx)
            if transfer_dtype:
                logger.info(
                    "transfer_dtype=%s inert in resident mode (no wav "
                    "transfers)", transfer_dtype,
                )
    # typed key so pcfg.rng_impl ("rbg" = TPU hardware generator, measured
    # 1.15-1.25x step + ~13x compile win, PERFORMANCE.md) rides through
    # every split; serialized via key_data for bit-exact resume
    rng_impl = {"threefry": "threefry2x32"}.get(pcfg.rng_impl, pcfg.rng_impl)
    rng = jax.random.key(pcfg.random_seed + 1, impl=rng_impl)
    history = []
    last = {}
    t0 = time.time()
    epoch = 0
    batch_in_epoch = 0  # batches consumed of the CURRENT epoch

    ckpt_path = os.path.join(save_dir, "d2v_last_state.msgpack")
    meta = {}
    if resume and os.path.exists(ckpt_path):
        # full resume: params/opt/EMA from the state, plus rng stream, epoch
        # position and logging history from the metadata — a resumed run
        # continues the interrupted one instead of replaying epoch 0 and
        # truncating d2v_training_history.json
        state, meta = restore_train_state(ckpt_path, state)
        if mesh is not None:
            # from_bytes returns host leaves — re-place so the restored
            # state keeps its dp/tp shardings instead of re-uploading a
            # replicated host tree on the first step
            from ..parallel.d2v_sharded import place_d2v_state as _place

            state = _place(state, mesh)
        meta = meta or {}
        if "rng" in meta:
            rng = jax.random.wrap_key_data(
                jax.numpy.asarray(np.asarray(meta["rng"], np.uint32)),
                impl=rng_impl,
            )
        epoch = int(meta.get("epoch", 0))
        batch_in_epoch = int(meta.get("batch_in_epoch", 0))
        history = list(meta.get("history", []))
        logger.info(
            "resumed at step %d (epoch %d, batch %d)",
            int(state.step), epoch, batch_in_epoch,
        )

    def save_ckpt(step):
        save_train_state(
            ckpt_path,
            state,
            metadata={
                "step": step,
                "epoch": epoch,
                "batch_in_epoch": batch_in_epoch,
                "rng": np.asarray(jax.random.key_data(rng)).tolist(),
                "history": history,
                "best_valid": (
                    best_valid if np.isfinite(best_valid) else None
                ),
            },
        )

    # periodic validation (the fairseq update loop's validate() +
    # checkpoint_best analogue)
    valid_ds = None
    _bv = meta.get("best_valid")
    best_valid = float("inf") if _bv is None else float(_bv)
    best_path = os.path.join(save_dir, "d2v_best_state.msgpack")
    if valid_manifests:
        from ..models import d2v_pretrain as _d2v_eval_models

        if binarized:
            from ..data.binarized import BinarizedWavDataset

            valid_ds = BinarizedWavDataset(
                valid_manifests, pcfg, split=valid_split
            )
        else:
            valid_ds = WavCropDataset(valid_manifests, pcfg, split=valid_split)
        if valid_ds.num_batches(pcfg.batch_size) == 0:
            raise ValueError(
                f"valid split has {len(valid_ds)} usable clips < "
                f"batch_size={pcfg.batch_size}: no validation batches "
                "(drop_last) — shrink batch_size or grow the split"
            )
        eval_fn = _d2v_eval_models.make_d2v_eval_step(model)

    def run_validation(at_step: int):
        nonlocal best_valid
        # fixed key/crop stream (epoch 0 crops, deterministic masks): the
        # metric is comparable across validation passes
        vkey = jax.random.key(pcfg.random_seed + 2, impl=rng_impl)
        losses = []
        for wav, pad in valid_ds.batches(0, pcfg.batch_size):
            vkey, k = jax.random.split(vkey)
            m = eval_fn(state.params, state.ema_blocks, wav, pad, k)
            losses.append(float(m["loss"]))
        if not losses:
            return
        vl = float(np.mean(losses))
        entry = {"step": at_step, "valid_loss": vl,
                 "wall_s": round(time.time() - t0, 1)}
        history.append(entry)
        improved = vl < best_valid
        logger.info("valid @ step %d | loss %.4f over %d batches%s",
                    at_step, vl, len(losses), " (best)" if improved else "")
        if improved:
            best_valid = vl
            save_train_state(
                best_path, state,
                metadata={"step": at_step, "valid_loss": vl},
            )

    done = int(state.step) >= pcfg.max_steps
    step = int(state.step)

    def process_chunk(first: int, k: int, mstack) -> bool:
        """Host-side handling of one dispatched chunk's stacked metrics:
        variance collapse guards per update (reference config.py:77-83, no
        warmup exemption) + history logging. Returns True on abort."""
        nonlocal last
        m = {
            kk: np.atleast_1d(np.asarray(v))
            for kk, v in jax.device_get(mstack).items()
        }
        for i in range(k):
            s = first + i
            abort = False
            if float(m["target_var"][i]) < pcfg.min_target_var:
                logger.error(
                    "target variance collapsed at step %d (%.4f < %.2f)",
                    s, float(m["target_var"][i]), pcfg.min_target_var,
                )
                abort = True
            if float(m["pred_var"][i]) < pcfg.min_pred_var:
                logger.error(
                    "prediction variance collapsed at step %d (%.4f < %.2f)",
                    s, float(m["pred_var"][i]), pcfg.min_pred_var,
                )
                abort = True
            # the final/aborting update must be logged (and returned) even
            # off the log_every grid
            if (s % log_every == 0 or s == 1 or abort
                    or s >= pcfg.max_steps):
                last = {kk: float(v[i]) for kk, v in m.items()}
                last["step"] = s
                last["wall_s"] = round(time.time() - t0, 1)
                history.append(last)
                logger.info(
                    "step %d | loss %.4f (d2v %.4f cls %.4f) | tvar %.3f "
                    "pvar %.3f | decay %.5f",
                    s, last["loss"], last["d2v_loss"], last["cls_loss"],
                    last["target_var"], last["pred_var"], last["ema_decay"],
                )
            if abort:
                return True
        return False

    def chunked(batches, budget):
        """Stacks up to ``chunk`` consecutive batches to (k, B, T), never
        emitting more than ``budget`` steps in total (so a chunk can't
        overrun max_steps); epoch-end/budget-end partials compile their own
        scan length."""
        buf, used = [], 0
        for wav, pad in batches:
            buf.append((wav, pad))
            if len(buf) == chunk or used + len(buf) >= budget:
                yield (np.stack([w for w, _ in buf]),
                       np.stack([p for _, p in buf]))
                used += len(buf)
                buf = []
                if used >= budget:
                    return
        if buf:
            yield (np.stack([w for w, _ in buf]),
                   np.stack([p for _, p in buf]))

    # guards are evaluated for EVERY update from step 1, but the host reads
    # a chunk's telemetry while the NEXT chunk runs on the device (lag-1):
    # the blocking device_get then overlaps compute instead of adding a
    # full device round-trip per dispatch (the synchronous version cost a
    # per-step sync on thin-link attaches — PERFORMANCE.md driver table).
    # Deliberate deviation: a collapse in chunk C is detected after chunk
    # C+1 was dispatched. The in-flight post-collapse updates are dropped
    # from the history/returned metrics, but the final saved state does
    # include them (kept for post-mortem — it is a collapsed run either
    # way); detection coverage is identical.
    aborted = False
    pending = None  # (first step index, k, stacked metrics of that chunk)
    while not done:
        epoch_had_batches = False
        if use_resident:
            # ~KB of (idx, starts) per step; no prefetch needed — the
            # uploads are latency-, not bandwidth-bound, and dispatch is
            # already asynchronous
            batch_iter = index_crop_batches(
                ds, epoch, pcfg.batch_size, res_sizes, skip=batch_in_epoch
            )
        else:
            src = ds.batches(epoch, pcfg.batch_size, skip=batch_in_epoch)
            if chunk > 1:
                src = chunked(src, pcfg.max_steps - step)
            batch_iter = prefetch(
                src,
                # with a mesh the sharded step dp-places the batch itself
                depth=2, to_device=mesh is None,
                transfer_fp32_as=transfer_dtype if mesh is None else None,
            )
        for wavs, pads in batch_iter:
            epoch_had_batches = True
            if use_resident:
                k = 1
                rng, key = jax.random.split(rng)
                # (wavs, pads) are the (idx, starts) index vectors here
                state, mstack = resident_step(
                    state, resident_corpus, wavs, pads, key,
                    crop=pcfg.crop_size,
                    starts_aligned=pcfg.crop_align % 128 == 0,
                )
            elif chunk > 1:
                k = int(wavs.shape[0])
                rng, keys = split_chunk_keys(rng, k)
                state, mstack = chunk_runner(state, wavs, pads, keys)
            else:
                k = 1
                rng, key = jax.random.split(rng)
                state, mstack = step_fn(state, wavs, pads, key)
            first = step + 1
            step += k  # host-side counter: no device sync needed to count
            batch_in_epoch += k
            if pending is not None and process_chunk(*pending):
                done = aborted = True
            pending = (first, k, mstack)
            at_end = step >= pcfg.max_steps
            crossed = bool(checkpoint_every) and (
                step // checkpoint_every > (first - 1) // checkpoint_every
            )
            vcrossed = (
                valid_ds is not None
                and valid_every > 0
                and step // valid_every > (first - 1) // valid_every
            )
            if at_end or done or crossed or vcrossed:
                # drain before checkpointing/validating/stopping so history
                # and the returned metrics are complete and ordered; after
                # an abort the in-flight chunk's post-collapse steps are
                # DISCARDED, not logged
                if not aborted and process_chunk(*pending):
                    done = aborted = True
                pending = None
            if vcrossed and not (at_end or done):
                run_validation(step)  # the final pass runs after the loop
            if crossed:
                save_ckpt(step)
            if at_end or done:
                done = True
                break
        else:
            if not epoch_had_batches and batch_in_epoch == 0:
                # genuinely too few clips for one batch (a resume whose
                # checkpoint landed on an exact epoch boundary also yields
                # an empty pass — batch_in_epoch > 0 — and must just roll
                # into the next epoch)
                raise ValueError(
                    f"epoch {epoch} produced no batches "
                    f"({len(ds.files_for_epoch(epoch))} usable clips < "
                    f"batch_size={pcfg.batch_size}, drop_last) — shrink "
                    "batch_size or relax min_sample_size"
                )
            epoch += 1
            batch_in_epoch = 0

    if valid_ds is not None and not aborted:
        # skipped after a collapse abort: a degenerate state must never be
        # crowned "best" just because no earlier validation ran
        run_validation(int(state.step))
    save_ckpt(int(state.step))
    enc_path = os.path.join(save_dir, "encoder_params.msgpack")
    save_train_state(enc_path, encoder_params(state.params))
    if valid_ds is not None and os.path.exists(best_path):
        best_state, _bmeta = restore_train_state(best_path, state)
        save_train_state(
            os.path.join(save_dir, "encoder_params_best.msgpack"),
            encoder_params(best_state.params),
        )
        logger.info("best valid loss %.4f -> encoder_params_best.msgpack",
                    best_valid)
    dump_json(history, os.path.join(save_dir, "d2v_training_history.json"))
    logger.info("saved %s (+ encoder subtree %s)", ckpt_path, enc_path)
    return last


def load_pretrained_encoder(save_dir: str, cfg: EncoderConfig):
    """Loads the exported encoder subtree back as Emotion2vecEncoder params
    (restored against a freshly-initialized template for shape checking)."""
    from ..models.emotion2vec import init_encoder
    from .checkpointing import restore_train_state

    _model, template = init_encoder(cfg, jax.random.PRNGKey(0))
    params, _ = restore_train_state(
        os.path.join(save_dir, "encoder_params.msgpack"), template
    )
    return params
