"""Fused wav->train cross-domain trainer: the reference's two-stage pipeline
(offline extraction, complete_preprocessing.ps1:42-153, then feature-level
training, train.py:635-662) collapsed into ONE program per step.

Train-time path per step (the bench.py production configuration):
raw noisy-stream waveforms -> on-device noise injection (white or NOISEX
bank; parallel/fused.py:inject_noise) -> frozen emotion2vec encoder ->
full DAD teacher-student update — one XLA dispatch, nothing touches the
host. The clean stream has no per-step randomness, so its features are
extracted ONCE at startup (cache_clean_features) and stream from the
feature store exactly like the feature-level trainer's clean batches.

Everything around the step is inherited from CrossDomainTrainer: anchor
calibration, DACP epoch updates, validation cadence with
teacher-student disagreement, best-checkpoint + BEST/FINAL report set,
early stopping, resume, analysis dumps. Validation/test run feature-level
on stores extracted at startup; the noisy val/test features come from a
FIXED seeded injection pass (the deterministic analogue of the reference's
offline noisy trees, add_real_noise_to_audio.py), so 'best noisy WA' means
the same thing in both trainers.
"""

from __future__ import annotations

import os
from collections import defaultdict
from dataclasses import replace
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..audio import noise as noise_ops
from ..configs import DADConfig, EncoderConfig
from ..data.batching import paired_epoch
from ..data.folds import corpus_fold_split
from ..data.prefetch import prefetch
from ..data.store import FeatureStore
from ..data.wavstore import (
    WAV_BUCKETS,
    PaddedWavIterator,
    WavStore,
    load_wav_store,
)
from ..dad import StepScalars, set_learning_rate
from ..dad.train_step import cosine_lr
from ..models.extract import FeatureExtractor
from ..parallel.fused import (
    CleanFeatureBatch,
    FusedBatch,
    FusedConfig,
    make_fused_extract_train_step,
    validate_injection,
)
from ..utils import get_logger
from .dad_trainer import CrossDomainTrainer

logger = get_logger(__name__)


def injection_display_name(fused_cfg: FusedConfig) -> str:
    """Synthesizes the reference noisy-tree dir name for the injection
    config, so extract_noise_info / the layered results dirs and report
    fields (train.py:113-192) come out identical to an offline-tree run."""
    from ..audio.noise import NOISE_TYPES

    if fused_cfg.inject_snr_choices:
        # multi-SNR uses its own db token, parsed by extract_noise_info's
        # multi branch, and KEEPS the bank mode (root1/root2) — so two
        # different multi configs never collapse into one 'unknown' dir
        db = "multi_" + "_".join(
            str(int(s)) for s in fused_cfg.inject_snr_choices
        ) + "db"
    else:
        db = f"{int(fused_cfg.inject_snr_db)}db"
    if fused_cfg.inject_noise_bank_mode == "random":
        return f"fused/root2-{db}"
    if fused_cfg.inject_noise_bank_mode == "fixed":
        t = NOISE_TYPES[fused_cfg.inject_noise_type]
        return f"fused/root1-{t}-{db}"
    return f"fused/root1-white-{db}"


def store_from_clips(
    feats: Sequence[np.ndarray], wavs: WavStore, dim: int
) -> FeatureStore:
    """Packs per-clip feature arrays into an in-memory FeatureStore carrying
    the wav store's labels/groups/names (reference on-disk layout semantics
    without the disk round-trip). ``dim`` pins the feature width when the
    total frame count is zero (so an all-too-short corpus can't silently
    shrink the head's input_dim via the dim-adjust path)."""
    sizes = np.asarray([len(f) for f in feats], np.int64)
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
    flat = (
        np.concatenate([f for f in feats if len(f)], axis=0)
        if int(sizes.sum())
        else np.zeros((0, dim), np.float32)
    )
    return FeatureStore(
        feats=flat.astype(np.float32),
        sizes=sizes,
        offsets=offsets,
        labels=wavs.labels,
        groups=wavs.groups,
        label_names=wavs.label_names,
        utt_names=wavs.utt_names,
    )


def inject_fixed(
    wavs: WavStore,
    fused_cfg: FusedConfig,
    noise_clips: Optional[List[np.ndarray]],
    seed: int,
) -> List[np.ndarray]:
    """Deterministic offline-injector-equivalent pass over every clip: the
    same numpy reference math the `inject` CLI uses (tile from offset 0,
    add_real_noise_to_audio.py:129-160 / add_noise_to_audio.py:14-43), with
    a per-clip seeded rng — this is the fixed noisy domain that validation
    and test measure against."""
    out = []
    for i in range(wavs.num):
        rng = np.random.default_rng((seed, i))
        clip = wavs.clip(i).astype(np.float64)
        if fused_cfg.inject_snr_choices:
            snr = float(rng.choice(fused_cfg.inject_snr_choices))
        else:
            snr = float(fused_cfg.inject_snr_db)
        if fused_cfg.inject_noise_bank_mode is None:
            noisy = noise_ops.add_white_noise_np(clip, snr, rng)
        else:
            if fused_cfg.inject_noise_bank_mode == "random":
                k = int(rng.integers(0, len(noise_clips)))
            else:
                k = fused_cfg.inject_noise_type
            seg = noise_ops.tile_noise_np(noise_clips[k], len(clip))
            noisy = noise_ops.add_real_noise_np(clip, seg, snr)
        out.append(noisy.astype(np.float32))
    return out


def prepare_fused_shared(
    cfg: DADConfig,
    manifest_dir: str,
    encoder_cfg: EncoderConfig,
    enc_params,
    fused_cfg: FusedConfig,
    noise_root: Optional[str],
    val_injection_seed: int = 42,
    extract_batch_size: int = 16,
    mesh=None,
    skip_noisy: bool = False,
    extract_buckets: Optional[Sequence[int]] = None,
) -> Dict:
    """The fold-INDEPENDENT startup artifacts of fused training: wav store,
    placed extractor, one clean extraction pass, the fixed noisy val/test
    domain (injection + extraction), and the raw noise clips. run_fused_cv
    computes this once and shares it across all folds (the per-fold cost on
    a tunnel-attached chip is dominated by these two extraction passes).

    ``skip_noisy``: skip the fixed-noisy-domain injection + extraction pass
    (``noisy_store`` is None in the result). For harnesses whose every
    experiment overrides the injection — the multi-noise/noise-grid suites —
    the base domain would be rebuilt by `refresh_noisy_domain` before any
    trainer sees it, so building it here is a wasted full-corpus extraction."""
    wav_store = load_wav_store(manifest_dir, cfg.label_map)
    if wav_store.labels is None:
        raise ValueError(f"{manifest_dir} has no label sidecar")

    # one extraction pass each for the clean corpus and the FIXED noisy
    # domain (validation/test target) — the startup-cost analogue of the
    # reference's offline extraction stage, amortized over all epochs
    kw = {} if extract_buckets is None else {"buckets": tuple(extract_buckets)}
    extractor = FeatureExtractor(
        encoder_cfg, enc_params, batch_size=extract_batch_size, mesh=mesh, **kw
    )
    logger.info("fused trainer: extracting clean features once")
    clean_feats = extractor.extract_clips(wav_store.clips())

    noise_clips = (
        noise_ops.load_noise_clips(noise_root)
        if fused_cfg.inject_noise_bank_mode is not None
        else None
    )
    noisy_store = None
    if not skip_noisy:
        logger.info("fused trainer: building fixed noisy val/test domain")
        noisy_wavs = inject_fixed(wav_store, fused_cfg, noise_clips,
                                  val_injection_seed)
        noisy_feats = extractor.extract_clips(noisy_wavs)
        noisy_store = store_from_clips(noisy_feats, wav_store,
                                       encoder_cfg.embed_dim)

    dim = encoder_cfg.embed_dim
    return {
        "wav_store": wav_store,
        "extractor": extractor,
        "clean_store": store_from_clips(clean_feats, wav_store, dim),
        "noisy_store": noisy_store,
        "noise_clips": noise_clips,
    }


def refresh_noisy_domain(
    shared: Dict,
    fused_cfg: FusedConfig,
    noise_root: Optional[str],
    val_injection_seed: int = 42,
) -> Dict:
    """Rebuilds only the injection-DEPENDENT half of a
    ``prepare_fused_shared`` dict — the fixed noisy val/test domain (and the
    raw noise clips when the new config needs a bank the old one didn't).

    The wav store, the placed extractor, and the clean extraction pass are
    injection-invariant and are reused as-is. This is what lets the fused
    ablation harness sweep the reference's noise grid
    (run_ablation_studies_iemocap.py:83-161 — 4 types x 4 SNRs of
    NOISY_DATA_DIR swaps, each of which the reference pays a full offline
    injection + extraction pipeline for) with one corpus decode and one
    clean extraction total: each cell costs only its own fixed-domain
    injection + extraction pass."""
    noise_clips = shared.get("noise_clips")
    if fused_cfg.inject_noise_bank_mode is not None and noise_clips is None:
        if not noise_root:
            raise ValueError("bank injection modes need noise_root")
        noise_clips = noise_ops.load_noise_clips(noise_root)
    wav_store = shared["wav_store"]
    extractor = shared["extractor"]
    logger.info("fused trainer: rebuilding fixed noisy val/test domain (%s)",
                injection_display_name(fused_cfg))
    noisy_wavs = inject_fixed(wav_store, fused_cfg, noise_clips,
                              val_injection_seed)
    noisy_feats = extractor.extract_clips(noisy_wavs)
    out = dict(shared)
    out["noise_clips"] = noise_clips
    out["noisy_store"] = store_from_clips(
        noisy_feats, wav_store, extractor.cfg.embed_dim
    )
    return out


def _normalize_fused_cfg(
    cfg: DADConfig,
    encoder_cfg: EncoderConfig,
    fused_cfg: Optional[FusedConfig],
    noise_root: Optional[str],
) -> FusedConfig:
    fused_cfg = fused_cfg or FusedConfig(
        encoder=encoder_cfg, dad=cfg, inject_snr_db=10.0
    )
    fused_cfg = replace(
        fused_cfg, encoder=encoder_cfg, cache_clean_features=True
    )
    validate_injection(fused_cfg)
    if fused_cfg.inject_snr_db is None and not fused_cfg.inject_snr_choices:
        raise ValueError("fused training needs an injection SNR "
                         "(inject_snr_db or inject_snr_choices)")
    if fused_cfg.inject_noise_bank_mode is not None and not noise_root:
        raise ValueError("bank injection modes need --noise-root")
    return fused_cfg


class FusedCrossDomainTrainer(CrossDomainTrainer):
    """CrossDomainTrainer whose training epochs run the fused
    wav->encoder->DAD step instead of the feature-level step."""

    def __init__(
        self,
        cfg: DADConfig,
        manifest_dir: str,
        encoder_cfg: EncoderConfig,
        enc_params,
        fused_cfg: Optional[FusedConfig] = None,
        noise_root: Optional[str] = None,
        fold: int = 0,
        experiment_name: Optional[str] = None,
        pretrain_params: Optional[dict] = None,
        prefetch_depth: int = 2,
        mesh=None,
        val_injection_seed: int = 42,
        extract_batch_size: int = 16,
        wav_buckets: Sequence[int] = WAV_BUCKETS,
        transfer_dtype: Optional[str] = None,
        shared: Optional[Dict] = None,
        extract_buckets: Optional[Sequence[int]] = None,
        resident="auto",
        resident_max_bytes: int = 8 << 30,
        scan_chunk: int = 0,
    ):
        """``transfer_dtype`` (e.g. "bfloat16"): ship the f32 wav + cached
        clean-feature batches to the device in this dtype and upcast on
        device — halves H2D bytes per step, which dominates fused training
        when the chip hangs off a thin link (PERFORMANCE.md). Audio in
        [-1, 1] loses ~0.2% relative precision in bf16, far below the
        injected noise floor. Single-device only — with a mesh the fused
        step's in_shardings place the batches (a warning is logged if both
        are requested).

        ``shared``: a ``prepare_fused_shared`` dict to reuse the
        fold-independent startup artifacts across folds (run_fused_cv).

        ``resident``: True / False / "auto" — commit the fold's training
        corpus (cached clean features + raw noisy-stream waveforms, both
        static for the whole run) to DEVICE memory once and gather batches
        on-device from per-step index vectors (parallel/resident.py),
        instead of assembling + uploading ~MBs of unchanging bytes every
        step. "auto" engages when the upload estimate fits
        ``resident_max_bytes`` (IEMOCAP's largest fold is ~3 GB vs 16 GB
        HBM). Semantics are identical to streaming (equivalence-tested);
        feature storage is bf16 when the encoder is bf16 (lossless — the
        f32 feature values are bf16-representable), f32 otherwise.

        ``scan_chunk > 0`` (resident mode only): run each training epoch as
        lax.scan chunks of that many steps — one XLA dispatch AND one
        ~KB index upload per chunk instead of ~4 latency-bound RPCs per
        step (parallel/resident.py make_resident_fused_epoch_runner).
        Chunks pad to chunk-common (t_clean, t_wav) buckets and the chunk
        key splits into per-step keys, exactly like the feature trainer's
        scan_chunk mode; same restriction too: single-device only."""
        fused_cfg = _normalize_fused_cfg(cfg, encoder_cfg, fused_cfg,
                                         noise_root)
        if mesh is not None and scan_chunk:
            raise ValueError("scan_chunk is not supported with a mesh "
                             "(per-batch dispatch keeps dp/tp shardings "
                             "simple); pass scan_chunk=0")
        if mesh is not None and transfer_dtype:
            logger.warning(
                "transfer_dtype=%s ignored: the fused step's mesh "
                "in_shardings place the batches", transfer_dtype,
            )
            transfer_dtype = None

        self.wav_buckets = tuple(wav_buckets)
        self.fused_transfer_dtype = transfer_dtype
        if shared is None:
            shared = prepare_fused_shared(
                cfg, manifest_dir, encoder_cfg, enc_params, fused_cfg,
                noise_root, val_injection_seed=val_injection_seed,
                extract_batch_size=extract_batch_size, mesh=mesh,
                extract_buckets=extract_buckets,
            )
        self.wav_store = shared["wav_store"]
        self.extractor = shared["extractor"]
        clean_store = shared["clean_store"]
        noisy_store = shared["noisy_store"]
        if noisy_store is None:
            raise ValueError(
                "shared startup lacks the fixed noisy domain (built with "
                "skip_noisy=True) — refresh_noisy_domain() it first"
            )

        cfg = replace(
            cfg,
            clean_data_dir=manifest_dir,
            noisy_data_dir=injection_display_name(fused_cfg),
        )
        super().__init__(
            cfg,
            fold=fold,
            experiment_name=experiment_name,
            clean_store=clean_store,
            noisy_store=noisy_store,
            pretrain_params=pretrain_params,
            scan_chunk=0,
            prefetch_depth=prefetch_depth,
            mesh=mesh,  # base shards the head train state; fused batches
            # are placed by the fused step's in_shardings
        )
        self.fused_cfg = replace(fused_cfg, dad=self.cfg)

        # the noisy TRAIN stream is raw clean wavs re-injected on device
        # every step (fresh noise per epoch — a superset of the reference's
        # fixed offline tree, same SNR statistics); independent shuffle
        # stream like the feature-level noisy loader
        wtr, _wva, _wte = corpus_fold_split(
            self.cfg.corpus, fold, self.wav_store.groups
        )
        self.noisy_wav_train = PaddedWavIterator(
            self.wav_store.subset(wtr),
            self.cfg.batch_size,
            buckets=self.wav_buckets,
            shuffle=True,
            seed=self.cfg.random_seed + 7919,
            labeled=False,  # SSL: labels withheld (dataload_noisy.py:214)
            bucket_shuffle=self.cfg.bucket_batches,
        )

        self._noise_bank = None
        if fused_cfg.inject_noise_bank_mode is not None:
            bank = np.stack(
                [
                    noise_ops.tile_noise_np(c, max(self.wav_buckets))
                    for c in shared["noise_clips"]
                ]
            ).astype(np.float32)
            if mesh is not None:
                # replicate up front: the fused step's in_shardings declare
                # the bank replicated, and a default-device placement would
                # make jit reshard ~9 MB on every call
                from ..parallel.mesh import replicated

                self._noise_bank = jax.device_put(
                    jnp.asarray(bank), replicated(mesh)
                )
            else:
                self._noise_bank = jax.device_put(jnp.asarray(bank))

        # extractor placed the encoder params already (tp-sharded when the
        # mesh has a tp axis); the base class replicated the head state
        self.enc_params = self.extractor.params
        self._fused_step = make_fused_extract_train_step(
            self.extractor.model, self.head, self.tx, self.fused_cfg, mesh
        )
        self.fused_scan_chunk = scan_chunk
        self._setup_resident(resident, resident_max_bytes)

    def _setup_resident(self, resident, resident_max_bytes: int) -> None:
        """Builds the device-resident corpus + gather step/runner (or leaves
        the streaming path active when disabled / too large)."""
        from ..parallel.resident import (
            make_resident_fused_epoch_runner,
            make_resident_fused_step,
            resident_from_store,
            resident_nbytes,
        )

        self._resident = None
        if resident is False:
            if self.fused_scan_chunk:
                logger.warning(
                    "scan_chunk=%d is inert without the resident corpus "
                    "(fused scan runs over HBM-resident clips only)",
                    self.fused_scan_chunk,
                )
            return
        clean_sub = self.clean_train.store
        wav_sub = self.noisy_wav_train.store
        feat_dtype = (
            "bfloat16" if self.fused_cfg.encoder.dtype == "bfloat16" else None
        )
        est = resident_nbytes(clean_sub, feat_dtype) + resident_nbytes(wav_sub)
        if resident == "auto" and est > resident_max_bytes:
            logger.info(
                "resident corpus disabled: estimated %.1f GB > budget %.1f GB"
                " — streaming batches from host%s", est / 1e9,
                resident_max_bytes / 1e9,
                (f" (scan_chunk={self.fused_scan_chunk} inert: fused scan "
                 "runs over HBM-resident clips only)")
                if self.fused_scan_chunk else "",
            )
            return
        self._resident = (
            resident_from_store(clean_sub, mesh=self.mesh, dtype=feat_dtype),
            resident_from_store(wav_sub, mesh=self.mesh, labeled=False),
        )
        if self.fused_scan_chunk:
            self._resident_runner = make_resident_fused_epoch_runner(
                self.extractor.model, self.head, self.tx, self.fused_cfg,
                self.mesh,
            )
        else:
            self._resident_step = make_resident_fused_step(
                self.extractor.model, self.head, self.tx, self.fused_cfg,
                self.mesh,
            )

    # ------------------------------------------------------------------
    def _paired_fused_epoch(self, epoch: int):
        """Pairs clean FEATURE batches (cached extraction) with noisy WAV
        batches via the same paired_epoch the feature-level trainer uses
        (truncate-to-shorter, train.py:479-483; PaddedWavIterator shares
        PaddedBatchIterator's set_epoch/len/iter contract)."""
        for cb, wb in paired_epoch(
            self.clean_train, self.noisy_wav_train, epoch
        ):
            yield (
                CleanFeatureBatch(
                    feats=cb.feats,
                    frame_mask=cb.padding_mask,
                    labels=cb.labels,
                    row_valid=cb.row_valid,
                ),
                FusedBatch(
                    wav=wb.wav,
                    wav_mask=wb.wav_mask,
                    labels=wb.labels,
                    row_valid=wb.row_valid,
                    ids=wb.ids,
                ),
            )

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        cfg = self.cfg
        scalars = StepScalars.for_epoch(cfg, epoch)
        self.state = self.state._replace(
            opt_state=set_learning_rate(self.state.opt_state, cosine_lr(cfg, epoch))
        )
        if self._resident is not None:
            return self._train_epoch_resident(epoch, scalars)
        totals = defaultdict(float)
        n = 0
        pairs = prefetch(
            self._paired_fused_epoch(epoch),
            depth=self.prefetch_depth,
            to_device=self.mesh is None,  # mesh shardings place batches
            transfer_fp32_as=self.fused_transfer_dtype
            if self.mesh is None else None,
        )
        for cfb, fwb in pairs:
            self._rng, key = jax.random.split(self._rng)
            args = (self.enc_params, self.state, cfb, fwb, scalars,
                    self.anchors, key)
            if self._noise_bank is not None:
                self.state, metrics = self._fused_step(*args, self._noise_bank)
            else:
                self.state, metrics = self._fused_step(*args)
            for k in ("total_loss", "supervised_ce_loss", "consistency_loss",
                      "ecda_loss"):
                totals[k] += float(metrics[k])
            n += 1
            if "tracking" in metrics:
                self._log_tracked(epoch, metrics["tracking"])
        self._epoch_end_dacp(epoch)
        return {k: v / max(n, 1) for k, v in totals.items()}

    def _train_epoch_resident(self, epoch: int, scalars) -> Dict[str, float]:
        """Device-resident epoch: per step the host ships only two (B,)
        index vectors + the rng key; batches are gathered from HBM inside
        the step. Metric materialization is deferred to epoch end so
        dispatches pipeline instead of paying a host round-trip per step
        (values identical to the streaming path — same float() sums in the
        same order, just later)."""
        if self.fused_scan_chunk:
            return self._train_epoch_resident_scanned(epoch, scalars)
        clean_c, wav_c = self._resident
        frame_cap = self.clean_train.max_frames
        per_step, per_track = [], []
        from ..parallel.resident import (
            materialize_metrics,
            materialize_tracking,
            paired_index_epoch,
        )

        for (cidx, t_c), (widx, t_w) in paired_index_epoch(
            self.clean_train, self.noisy_wav_train, epoch
        ):
            self._rng, key = jax.random.split(self._rng)
            args = (self.enc_params, self.state, clean_c, wav_c,
                    jnp.asarray(cidx), jnp.asarray(widx), scalars,
                    self.anchors, key)
            if self._noise_bank is not None:
                args = args + (self._noise_bank,)
            self.state, metrics = self._resident_step(
                *args, t_clean=t_c, t_wav=t_w, frame_cap=frame_cap
            )
            per_step.append(metrics)
            if "tracking" in metrics:
                per_track.append(metrics["tracking"])
        totals = defaultdict(float)
        mkeys = ("total_loss", "supervised_ce_loss", "consistency_loss",
                 "ecda_loss")
        # one stacked device->host pull for the epoch's metric scalars (and
        # one per tracking key) instead of a latency-bound round trip per
        # float(): see parallel/resident.py materialize_metrics
        for row in materialize_metrics(per_step, mkeys):
            for k, v in zip(mkeys, row):
                totals[k] += float(v)
        for tracking in materialize_tracking(per_track):
            self._log_tracked(epoch, tracking)
        self._epoch_end_dacp(epoch)
        return {k: v / max(len(per_step), 1) for k, v in totals.items()}

    def _train_epoch_resident_scanned(self, epoch: int, scalars):
        """Chunked-scan flavor of the resident fused epoch: one dispatch AND
        one ~KB (S, B) index upload per scan_chunk steps (the fused analogue
        of CrossDomainTrainer._run_epoch_resident_scanned). Chunks pad both
        streams to chunk-common buckets; the per-step resident path's ~4
        latency-bound RPCs per step drop to ~4 per chunk."""
        from ..parallel.resident import (
            materialize_chunked_metrics,
            paired_index_epoch,
        )

        clean_c, wav_c = self._resident
        frame_cap = self.clean_train.max_frames
        deferred = []
        buf = []
        n_pairs = min(len(self.clean_train), len(self.noisy_wav_train))
        for i, pair in enumerate(paired_index_epoch(
            self.clean_train, self.noisy_wav_train, epoch
        )):
            buf.append(pair)
            if len(buf) == self.fused_scan_chunk or i == n_pairs - 1:
                t_c = max(t for (_idx, t), _ in buf)
                t_w = max(t for _, (_idx, t) in buf)
                cidx = np.stack([c for (c, _), _ in buf])
                widx = np.stack([w for _, (w, _) in buf])
                self._rng, key = jax.random.split(self._rng)
                args = (self.enc_params, self.state, clean_c, wav_c,
                        jnp.asarray(cidx), jnp.asarray(widx), scalars,
                        self.anchors, key, self._noise_bank)
                self.state, metrics = self._resident_runner(
                    *args, t_clean=t_c, t_wav=t_w, frame_cap=frame_cap
                )
                deferred.append((len(buf), metrics))
                buf = []
        totals = defaultdict(float)
        n = 0
        mkeys = ("total_loss", "supervised_ce_loss", "consistency_loss",
                 "ecda_loss")
        # one stacked device->host pull for all chunks' per-step scalars
        for row in materialize_chunked_metrics(
            [m for _, m in deferred], mkeys
        ):
            for k, v in zip(mkeys, row):
                totals[k] += float(v)
        for m, metrics in deferred:
            n += m
            if "tracking" in metrics:
                host = {k: np.asarray(v) for k, v in metrics["tracking"].items()}
                for s in range(m):
                    self._log_tracked(
                        epoch, {k: v[s] for k, v in host.items()}
                    )
        self._epoch_end_dacp(epoch)
        return {k: v / max(n, 1) for k, v in totals.items()}


def run_fused_cv(
    cfg: DADConfig,
    manifest_dir: str,
    encoder_cfg: EncoderConfig,
    enc_params,
    fused_cfg: Optional[FusedConfig] = None,
    noise_root: Optional[str] = None,
    folds=None,
    experiment_name: Optional[str] = None,
    pretrain_params: Optional[dict] = None,
    prefetch_depth: int = 2,
    mesh=None,
    transfer_dtype: Optional[str] = None,
    resident="auto",
    scan_chunk: int = 0,
) -> Dict:
    """K-fold sweep for the fused trainer (run_cv counterpart)."""
    import re

    from ..utils import dump_json
    from .dad_trainer import extract_noise_info

    n_folds = {"iemocap": 5, "casia": 4, "emodb": 10}[cfg.corpus]
    folds = list(folds) if folds is not None else list(range(n_folds))
    # fold-independent startup (wav decode, 2 extraction passes, fixed
    # injection, noise clips) happens ONCE — on a tunnel-attached chip the
    # extraction passes dominate per-fold startup
    fused_cfg = _normalize_fused_cfg(cfg, encoder_cfg, fused_cfg, noise_root)
    shared = prepare_fused_shared(
        cfg, manifest_dir, encoder_cfg, enc_params, fused_cfg, noise_root,
        mesh=mesh,
    )
    all_results = []
    for fold in folds:
        try:
            trainer = FusedCrossDomainTrainer(
                cfg,
                manifest_dir,
                encoder_cfg,
                enc_params,
                fused_cfg=fused_cfg,
                noise_root=noise_root,
                fold=fold,
                experiment_name=experiment_name,
                pretrain_params=pretrain_params,
                prefetch_depth=prefetch_depth,
                mesh=mesh,
                transfer_dtype=transfer_dtype,
                shared=shared,
                resident=resident,
                scan_chunk=scan_chunk,
            )
            trainer.train()
            all_results.append(trainer.final_summary())
        except Exception as e:  # keep the sweep alive (train.py:786-789)
            logger.error("fold %d failed: %s", fold + 1, e, exc_info=True)
            all_results.append({"fold": fold + 1, "error": str(e)})
    ok = [r for r in all_results if "error" not in r]
    display = extract_noise_info(injection_display_name(fused_cfg))[
        "display_name"
    ]
    summary = {
        "noise": display,
        "folds": all_results,
        "mean_noisy_weighted_acc": float(
            np.mean([r["best_noisy_weighted_acc"] for r in ok])
        )
        if ok
        else None,
        "std_noisy_weighted_acc": float(
            np.std([r["best_noisy_weighted_acc"] for r in ok])
        )
        if ok
        else None,
    }
    out_dir = cfg.results_base_dir
    if experiment_name:
        out_dir = os.path.join(out_dir, re.sub(r'[\\/*?:"<>|]', "", experiment_name))
    dump_json(summary, os.path.join(out_dir, "final_summary_report.json"))
    return summary
