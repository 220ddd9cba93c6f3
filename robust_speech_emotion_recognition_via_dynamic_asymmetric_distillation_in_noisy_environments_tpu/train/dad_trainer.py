"""DAD cross-domain trainer — the counterpart of IEMOCAPCrossDomainTrainer /
FixedCASIACrossDomainTrainer / FixedEMODBCrossDomainTrainer (reference DAD
train.py:44-762, train_CASIA.py, train_emodb.py) collapsed into one class
parameterized by the corpus preset.

Everything per-batch lives in the jitted DAD train step
(dad/train_step.py); this class owns the host-side loop: noise-info parsing
from the noisy dir name, layered results directories, anchor calibration,
per-epoch scalars/LR, validation with teacher-student disagreement tracking,
best-checkpoint persistence (flax msgpack + reference-layout torch .pth),
early stopping on noisy weighted accuracy, analysis-data dumps and the final
test-set evaluation.
"""

from __future__ import annotations

import os
import re
from collections import defaultdict
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import DADConfig
from ..data.batching import PaddedBatchIterator, paired_epoch
from ..data.prefetch import prefetch
from ..data.folds import corpus_fold_split
from ..data.store import FeatureStore, load_feature_store
from ..dad import (
    StepScalars,
    init_dad_train_state,
    make_dad_train_step,
    make_eval_step,
    run_anchor_calibration,
    set_learning_rate,
)
from ..dad.train_step import cosine_lr, epoch_end_dacp
from ..eval.metrics import evaluate_domain
from ..eval.reports import (
    best_detailed_results,
    final_test_report,
    save_confusion_matrices,
)
from ..models.convert import (
    load_pretrain_head_checkpoint,
    save_torch_file,
    ssrl_to_torch_state_dict,
    torch_state_dict_to_ssrl,
)
from ..models.heads import load_pretrain_into_ssrl
from ..utils import dump_json, get_logger

logger = get_logger(__name__)


def extract_noise_info(noisy_path: str) -> Dict:
    """Parses root1/root2 noise trees from the noisy dir path
    (reference train.py:113-192)."""
    # fused multi-SNR runs (train/fused_trainer.py:injection_display_name)
    # carry their whole SNR set in the db token
    m = re.search(r"root1-([^-]+)-(multi(?:_\d+)+)db", noisy_path,
                  re.IGNORECASE)
    if m:
        noise_type, db = m.group(1), m.group(2)
        return {
            "root_type": "root1",
            "noise_type": noise_type,
            "db_value": f"{db}db",
            "display_name": f"root1-{noise_type}-{db}db",
        }
    m = re.search(r"root2-(multi(?:_\d+)+)db", noisy_path, re.IGNORECASE)
    if m:
        db = m.group(1)
        return {
            "root_type": "root2",
            "noise_type": None,
            "db_value": f"{db}db",
            "display_name": f"root2-{db}db",
        }
    m = re.search(r"root1-([^.]+)\.wav-(\d+)db", noisy_path, re.IGNORECASE)
    if not m:
        m = re.search(r"root1-([^-]+)-(\d+)db", noisy_path, re.IGNORECASE)
    if m:
        noise_type, db = m.group(1), m.group(2)
        return {
            "root_type": "root1",
            "noise_type": noise_type,
            "db_value": f"{db}db",
            "display_name": f"root1-{noise_type}-{db}db",
        }
    m = re.search(r"root2-(\d+)db", noisy_path, re.IGNORECASE)
    if m:
        db = m.group(1)
        return {
            "root_type": "root2",
            "noise_type": None,
            "db_value": f"{db}db",
            "display_name": f"root2-{db}db",
        }
    for pattern in (r"(\d+)db", r"(-?\d+)_?db"):
        m = re.search(pattern, noisy_path, re.IGNORECASE)
        if m:
            db = m.group(1)
            return {
                "root_type": "unknown",
                "noise_type": "unknown",
                "db_value": f"{db}db",
                "display_name": f"unknown-{db}db",
            }
    return {
        "root_type": "unknown",
        "noise_type": "unknown",
        "db_value": "unknown_db",
        "display_name": "unknown-unknown-unknown_db",
    }


class CrossDomainTrainer:
    def __init__(
        self,
        cfg: DADConfig,
        fold: int = 0,
        experiment_name: Optional[str] = None,
        clean_store: Optional[FeatureStore] = None,
        noisy_store: Optional[FeatureStore] = None,
        pretrain_params: Optional[dict] = None,
        scan_chunk: int = 0,
        prefetch_depth: int = 2,
        transfer_dtype: Optional[str] = None,
        mesh=None,
        resident=False,
        resident_max_bytes: int = 8 << 30,
    ):
        """``scan_chunk > 0`` runs the epoch as lax.scan over chunks of that
        many batches (one device dispatch per chunk instead of per batch) —
        numerically identical to per-batch stepping; see dad/epoch_scan.py.

        ``resident``: True / False / "auto" — commit the fold's training
        feature corpora (clean + noisy, static for the whole run) to DEVICE
        memory once and gather batches on-device from per-step index
        vectors (parallel/resident.py) instead of re-uploading ~MBs of
        unchanging 768-d rows every step. Composes with ``scan_chunk``
        (one dispatch AND ~KB of traffic per chunk, the best tunnel
        configuration); numerics match the corresponding streaming path
        exactly (per-batch bucket shapes without scan_chunk, chunk-common
        padding + per-chunk key split with it). "auto" engages when the
        upload estimate fits ``resident_max_bytes`` and no mesh is given;
        True with a mesh raises (the dp-sharded feature step streams —
        use the fused trainer for mesh+resident).

        ``prefetch_depth > 0`` assembles + device_puts batch N+1 on a worker
        thread while step N runs (data/prefetch.py); 0 disables.

        ``transfer_dtype`` (e.g. "bfloat16"): ship float32 features to the
        device in this dtype and upcast on device — halves H2D bytes at the
        cost of bf16-quantized inputs (opt-in; see data/prefetch.py).

        ``mesh`` (jax.sharding.Mesh from parallel.make_mesh): dp-shard every
        training batch over the mesh (parallel/sharded.py; numerically the
        single-device step on the same global batch, gradient all-reduce
        over ICI). batch_size must divide by the dp extent. Mutually
        exclusive with scan_chunk."""
        if mesh is not None and scan_chunk:
            raise ValueError("scan_chunk is not supported with a mesh "
                             "(per-batch dispatch already amortizes across "
                             "devices)")
        if mesh is not None and resident is True:
            raise ValueError("resident=True is not supported with a mesh in "
                             "the feature-mode trainer (the fused trainer "
                             "supports mesh+resident)")
        if mesh is not None and cfg.batch_size % mesh.shape.get("dp", 1):
            raise ValueError(
                f"batch_size={cfg.batch_size} must divide by "
                f"dp={mesh.shape.get('dp', 1)}"
            )
        self.cfg = cfg
        self.fold = fold
        self.scan_chunk = scan_chunk
        self._resident_mode = resident
        self._resident_max_bytes = resident_max_bytes
        self.prefetch_depth = prefetch_depth
        self.transfer_dtype = transfer_dtype
        self.mesh = mesh
        self.experiment_name = experiment_name
        self.noise_info = extract_noise_info(cfg.noisy_data_dir)
        self.results_dir = self._setup_results_directory()
        self.num_classes = cfg.num_classes
        self.class_names = list(cfg.class_names)

        self.best_noisy_weighted_acc = 0.0
        self.best_clean_weighted_acc = 0.0
        self.best_results = {"epoch": 0}
        self.training_history = defaultdict(list)
        self.patience_counter = 0
        self.bias_analysis_log = []
        self.tracked_sample_indices: Optional[set] = None

        self._setup_data(clean_store, noisy_store)
        self._setup_model(pretrain_params)
        self._setup_anchors()
        self._setup_training()

    # ------------------------------------------------------------------
    def _setup_results_directory(self) -> str:
        base = self.cfg.results_base_dir
        if self.experiment_name:
            safe = re.sub(r'[\\/*?:"<>|]', "", self.experiment_name)
            base = os.path.join(base, safe)
        info = self.noise_info
        if info["root_type"] == "root1":
            d = os.path.join(
                base, "root1", info["noise_type"], info["db_value"],
                f"fold_{self.fold + 1}",
            )
        elif info["root_type"] == "root2":
            d = os.path.join(base, "root2", info["db_value"], f"fold_{self.fold + 1}")
        else:
            d = os.path.join(base, "unknown", f"fold_{self.fold + 1}")
        for sub in ("models", "plots", "reports"):
            os.makedirs(os.path.join(d, sub), exist_ok=True)
        return d

    def _setup_data(self, clean_store, noisy_store):
        cfg = self.cfg
        if clean_store is None:
            clean_store = load_feature_store(cfg.clean_data_dir, cfg.label_map)
        if noisy_store is None:
            noisy_store = load_feature_store(cfg.noisy_data_dir, cfg.label_map)
        assert clean_store.validate() and noisy_store.validate()
        if clean_store.dim != cfg.input_dim:
            from dataclasses import replace

            logger.info("adjusting input_dim %d -> %d (from feature store)",
                        cfg.input_dim, clean_store.dim)
            self.cfg = cfg = replace(cfg, input_dim=clean_store.dim)
        self.clean_store, self.noisy_store = clean_store, noisy_store

        ctr, cva, cte = corpus_fold_split(cfg.corpus, self.fold, clean_store.groups)
        ntr, nva, nte = corpus_fold_split(cfg.corpus, self.fold, noisy_store.groups)

        def it(store, idx, shuffle, bs=None, labeled=True, seed_offset=0):
            sub = store.subset(idx)
            if not labeled:
                sub.labels = None  # SSL: labels withheld (dataload_noisy.py:214)
            return PaddedBatchIterator(
                sub,
                bs or cfg.batch_size,
                cfg.length_buckets,
                shuffle=shuffle,
                seed=cfg.random_seed + seed_offset,
                # opt-in bucket-homogeneous batches; shuffled (train)
                # iterators only — eval order is untouched
                bucket_shuffle=shuffle and cfg.bucket_batches,
            )

        self.clean_train = it(clean_store, ctr, True)
        self.clean_val = it(clean_store, cva, False)
        self.clean_test = it(clean_store, cte, False)
        # NB: distinct shuffle stream — the clean and noisy stores list the
        # same utterances in the same order, so a shared (seed, epoch)
        # permutation would pair every clean batch with its own noise-added
        # twin; the reference's two DataLoaders shuffle independently
        # (train.py:479-483), making the clean/noisy pairing random.
        self.noisy_train = it(noisy_store, ntr, True, labeled=False,
                              seed_offset=7919)
        self.noisy_val = it(noisy_store, nva, False)
        self.noisy_test = it(noisy_store, nte, False)
        # calibration loaders at batch_size*2 (train.py:324-325): clean TRAIN
        # + noisy VAL — a preserved reference quirk
        self.calib_clean = it(clean_store, ctr, False, bs=cfg.batch_size * 2)
        self.calib_noisy = it(noisy_store, nva, False, bs=cfg.batch_size * 2)

        n_noisy_train = len(ntr)
        if n_noisy_train > cfg.num_tracked_samples:
            rng = np.random.default_rng(cfg.random_seed)
            self.tracked_sample_indices = set(
                rng.choice(n_noisy_train, cfg.num_tracked_samples, replace=False)
                .tolist()
            )

    def _setup_model(self, pretrain_params):
        cfg = self.cfg
        self.head, self.tx, self.state = init_dad_train_state(
            cfg, jax.random.PRNGKey(cfg.random_seed)
        )
        if pretrain_params is None and cfg.pretrained_weight:
            pretrain_params = load_pretrain_head_checkpoint(cfg.pretrained_weight)
        if pretrain_params is not None:
            ssrl = load_pretrain_into_ssrl(self.state.ssrl, pretrain_params)
            self.state = self.state._replace(ssrl=ssrl)
            logger.info("loaded pretrained head weights into student + teacher")

    def _setup_anchors(self):
        cfg = self.cfg
        if cfg.dacp.use_dacp and cfg.dacp.anchor_calibration_enabled:
            anchors = run_anchor_calibration(
                self.head, self.state.ssrl.student, self.calib_clean,
                self.calib_noisy, cfg,
            )
            logger.info("calibrated anchors: %s", np.round(anchors, 4).tolist())
        else:
            anchors = np.zeros(cfg.num_classes, np.float32)
        self.anchors = jnp.asarray(anchors)

    def _setup_training(self):
        if self.mesh is not None:
            from ..parallel.sharded import (
                make_sharded_dad_train_step,
                shard_dad_state,
            )

            self.train_step = make_sharded_dad_train_step(
                self.head, self.tx, self.cfg, self.mesh
            )
            self.state = shard_dad_state(self.state, self.mesh)
        else:
            self.train_step = make_dad_train_step(self.head, self.tx, self.cfg)
        self.eval_step = make_eval_step(self.head)
        self._epoch_runner = None
        if self.scan_chunk:
            from ..dad.epoch_scan import make_dad_epoch_runner

            self._epoch_runner = make_dad_epoch_runner(self.head, self.tx, self.cfg)
        self._rng = jax.random.PRNGKey(self.cfg.random_seed + 1)
        self._setup_feature_resident()

    def _setup_feature_resident(self) -> None:
        """Commits the fold's clean + noisy feature corpora to device memory
        and builds the gather step/runner (parallel/resident.py), or leaves
        the streaming path active (resident=False / "auto" over budget /
        mesh)."""
        self._resident = None
        resident = self._resident_mode
        if resident is False or self.mesh is not None:
            return
        from ..parallel.resident import (
            make_resident_dad_epoch_runner,
            make_resident_dad_step,
            resident_from_store,
            resident_nbytes,
        )

        clean_sub = self.clean_train.store
        noisy_sub = self.noisy_train.store
        est = resident_nbytes(clean_sub) + resident_nbytes(noisy_sub)
        if resident == "auto" and est > self._resident_max_bytes:
            logger.info(
                "resident corpus disabled: estimated %.1f GB > budget "
                "%.1f GB — streaming batches from host",
                est / 1e9, self._resident_max_bytes / 1e9,
            )
            return
        self._resident = (
            resident_from_store(clean_sub),
            resident_from_store(noisy_sub),
        )
        if self.scan_chunk:
            self._resident_runner = make_resident_dad_epoch_runner(
                self.head, self.tx, self.cfg
            )
        else:
            self._resident_step = make_resident_dad_step(
                self.head, self.tx, self.cfg
            )

    # ------------------------------------------------------------------
    def is_warmup(self, epoch: int) -> bool:
        return epoch < self.cfg.warmup_epochs

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        cfg = self.cfg
        scalars = StepScalars.for_epoch(cfg, epoch)
        self.state = self.state._replace(
            opt_state=set_learning_rate(self.state.opt_state, cosine_lr(cfg, epoch))
        )
        totals = defaultdict(float)
        n = 0
        if self._resident is not None:
            n = self._run_epoch_resident(epoch, scalars, totals)
        elif self._epoch_runner is not None:
            n = self._run_epoch_scanned(epoch, scalars, totals)
        else:
            pairs = prefetch(
                paired_epoch(self.clean_train, self.noisy_train, epoch),
                depth=self.prefetch_depth,
                # with a mesh the sharded step dp-places batches itself
                to_device=self.mesh is None,
                transfer_fp32_as=self.transfer_dtype if self.mesh is None
                else None,
            )
            for clean_b, noisy_b in pairs:
                self._rng, key = jax.random.split(self._rng)
                self.state, metrics, tracking = self.train_step(
                    self.state, clean_b, noisy_b, scalars, self.anchors, key
                )
                for k in ("total_loss", "supervised_ce_loss", "consistency_loss", "ecda_loss"):
                    totals[k] += float(metrics[k])
                n += 1
                self._log_tracked(epoch, tracking)
        self._epoch_end_dacp(epoch)
        return {k: v / max(n, 1) for k, v in totals.items()}

    def _epoch_end_dacp(self, epoch: int) -> None:
        """Post-epoch DACP quality update + analysis history (shared with
        the fused wav->train trainer, train/fused_trainer.py)."""
        cfg = self.cfg
        if self.is_warmup(epoch):
            return
        self.state = epoch_end_dacp(self.state, cfg)
        self.training_history["dacp_ema_thresholds"].append(
            np.asarray(self.state.dacp.ema_thresholds).tolist()
        )
        self.training_history["dacp_class_quality"].append(
            np.asarray(self.state.dacp.quality).tolist()
        )
        quality = np.asarray(self.state.dacp.quality)
        attn = np.exp(
            cfg.ecda.class_attention_lambda * (quality.mean() - quality)
        )
        self.training_history["ecda_class_attention"].append(attn.tolist())

    def _iter_scanned_chunks(self, epoch):
        """Streams (clean_stacked, noisy_stacked) scan chunks; the host-side
        chunk stacking runs inside the prefetch worker, overlapping the
        device execution of the previous chunk."""
        from ..dad.epoch_scan import stack_batches

        buf = []
        n_pairs = min(len(self.clean_train), len(self.noisy_train))
        for i, pair in enumerate(
            paired_epoch(self.clean_train, self.noisy_train, epoch)
        ):
            buf.append(pair)
            if len(buf) == self.scan_chunk or i == n_pairs - 1:
                t_pad = max(b.feats.shape[1] for pair_ in buf for b in pair_)
                yield (
                    stack_batches([p[0] for p in buf], t_pad),
                    stack_batches([p[1] for p in buf], t_pad),
                )
                buf = []

    def _run_epoch_scanned(self, epoch, scalars, totals) -> int:
        """Chunked lax.scan epoch: one dispatch per scan_chunk batches."""
        n = 0
        chunks = prefetch(
            self._iter_scanned_chunks(epoch),
            depth=self.prefetch_depth,
            to_device=True,
            transfer_fp32_as=self.transfer_dtype,
        )
        for clean_s, noisy_s in chunks:
            self._rng, key = jax.random.split(self._rng)
            self.state, metrics, tracking = self._epoch_runner(
                self.state, clean_s, noisy_s, scalars, self.anchors, key
            )
            m = int(clean_s.feats.shape[0])
            for k in (
                "total_loss",
                "supervised_ce_loss",
                "consistency_loss",
                "ecda_loss",
            ):
                totals[k] += float(metrics[k]) * m
            n += m
            if self.tracked_sample_indices and not self.is_warmup(epoch):
                # materialize tracking arrays once per chunk, not per step
                host = {key_: np.asarray(v) for key_, v in tracking.items()}
                for s in range(m):
                    self._log_tracked(
                        epoch, {key_: v[s] for key_, v in host.items()}
                    )
        return n

    def _run_epoch_resident(self, epoch, scalars, totals) -> int:
        """Device-resident epoch: the host ships only (B,) index vectors +
        keys per step (or (S,B) per scan chunk); feature batches are
        gathered from HBM inside the step. Metric/tracking materialization
        is deferred to epoch end so dispatches pipeline instead of paying a
        host round-trip per step — values identical to the corresponding
        streaming path (same float() sums in the same order, just later)."""
        if self.scan_chunk:
            return self._run_epoch_resident_scanned(epoch, scalars, totals)
        from ..parallel.resident import (
            materialize_metrics,
            materialize_tracking,
            paired_index_epoch,
        )

        clean_c, noisy_c = self._resident
        cap = self.clean_train.max_frames
        deferred_m, deferred_t = [], []
        track = (self.tracked_sample_indices is not None
                 and not self.is_warmup(epoch))
        for (cidx, t_c), (nidx, t_n) in paired_index_epoch(
            self.clean_train, self.noisy_train, epoch
        ):
            self._rng, key = jax.random.split(self._rng)
            self.state, metrics, tracking = self._resident_step(
                self.state, clean_c, noisy_c, jnp.asarray(cidx),
                jnp.asarray(nidx), scalars, self.anchors, key,
                t_clean=t_c, t_noisy=t_n, frame_cap=cap,
            )
            deferred_m.append(metrics)
            if track:
                deferred_t.append(tracking)
        mkeys = ("total_loss", "supervised_ce_loss", "consistency_loss",
                 "ecda_loss")
        vals = materialize_metrics(deferred_m, mkeys)
        for row in vals:
            for k, v in zip(mkeys, row):
                totals[k] += float(v)
        for tracking in materialize_tracking(deferred_t):
            self._log_tracked(epoch, tracking)
        return len(deferred_m)

    def _run_epoch_resident_scanned(self, epoch, scalars, totals) -> int:
        """Chunked-scan flavor of the resident epoch: one dispatch AND ~KB
        of host traffic per scan_chunk batches; numerics match the streamed
        scanned path (_run_epoch_scanned) exactly — same chunk-common
        padding, same per-chunk key split."""
        from ..parallel.resident import paired_index_epoch

        clean_c, noisy_c = self._resident
        cap = self.clean_train.max_frames
        n = 0
        buf = []
        deferred = []
        n_pairs = min(len(self.clean_train), len(self.noisy_train))
        for i, pair in enumerate(paired_index_epoch(
            self.clean_train, self.noisy_train, epoch
        )):
            buf.append(pair)
            if len(buf) == self.scan_chunk or i == n_pairs - 1:
                t_pad = max(t for p in buf for (_idx, t) in p)
                cidx = np.stack([c for (c, _), _ in buf])
                nidx = np.stack([m for _, (m, _) in buf])
                self._rng, key = jax.random.split(self._rng)
                self.state, metrics, tracking = self._resident_runner(
                    self.state, clean_c, noisy_c, jnp.asarray(cidx),
                    jnp.asarray(nidx), scalars, self.anchors, key,
                    t_pad=t_pad, frame_cap=cap,
                )
                deferred.append((len(buf), metrics, tracking))
                buf = []
        for m, metrics, tracking in deferred:
            for k in ("total_loss", "supervised_ce_loss",
                      "consistency_loss", "ecda_loss"):
                totals[k] += float(metrics[k]) * m
            n += m
            if self.tracked_sample_indices and not self.is_warmup(epoch):
                host = {k_: np.asarray(v) for k_, v in tracking.items()}
                for s in range(m):
                    self._log_tracked(
                        epoch, {k_: v[s] for k_, v in host.items()}
                    )
        return n

    def _log_tracked(self, epoch, tracking):
        if not self.tracked_sample_indices or self.is_warmup(epoch):
            return
        ids = np.asarray(tracking["ids"])
        preds = np.asarray(tracking["pseudo_label"])
        scores = np.asarray(tracking["certainty_score"])
        mask = np.asarray(tracking["is_masked_in"])
        for i, sid in enumerate(ids):
            if int(sid) in self.tracked_sample_indices:
                self.bias_analysis_log.append(
                    {
                        "epoch": epoch,
                        "sample_id": int(sid),
                        "pseudo_label": int(preds[i]),
                        "certainty_score": float(scores[i]),
                        "is_masked_in": bool(mask[i]),
                    }
                )

    # ------------------------------------------------------------------
    def _predict_all(self, it: PaddedBatchIterator, params):
        y_true, y_pred = [], []
        for b in prefetch(it, depth=self.prefetch_depth):
            preds, _ = self.eval_step(params, jnp.asarray(b.feats), jnp.asarray(b.padding_mask))
            preds = np.asarray(preds)
            for i in range(len(preds)):
                if b.row_valid[i] and b.labels[i] >= 0:
                    y_true.append(int(b.labels[i]))
                    y_pred.append(int(preds[i]))
        return np.array(y_true), np.array(y_pred)

    def validate(self, it: PaddedBatchIterator, domain: str, epoch: int = 0) -> Dict:
        y_true, y_pred = self._predict_all(it, self.state.ssrl.student)
        if "noisy" in domain.lower() and not self.is_warmup(epoch):
            _t, teacher_pred = self._predict_all(it, self.state.ssrl.teacher)
            if len(teacher_pred) == len(y_pred):
                rate = float(np.mean(y_pred != teacher_pred))
                self.training_history[f"disagreement_rate_{domain.lower()}"].append(rate)
        return evaluate_domain(y_true, y_pred, self.num_classes)

    # ------------------------------------------------------------------
    def save_checkpoint(self, epoch, clean_results, noisy_results, is_best):
        if not is_best:
            return
        self.best_results.update(
            {"epoch": epoch, "clean_results": clean_results, "noisy_results": noisy_results}
        )
        models_dir = os.path.join(self.results_dir, "models")
        # reference-layout torch checkpoint for cross-compat with the
        # reference's inference/analysis scripts
        sd = ssrl_to_torch_state_dict(self.state.ssrl)
        save_torch_file(sd, os.path.join(models_dir, f"{self.cfg.corpus}_cross_domain_best.pth"))
        best_detailed_results(
            self.results_dir, self.noise_info, self.fold, epoch,
            clean_results, noisy_results, self.class_names, is_best=True,
        )
        save_confusion_matrices(
            self.results_dir, clean_results, noisy_results, epoch,
            self.class_names, self.noise_info["display_name"], is_best=True,
        )
        logger.info("best checkpoint saved at epoch %d", epoch + 1)

    def check_early_stopping(self, noisy_results, is_best) -> bool:
        if not self.cfg.early_stopping:
            return False
        if is_best:
            self.patience_counter = 0
            return False
        self.patience_counter += 1
        return self.patience_counter >= self.cfg.patience

    # ------------------------------------------------------------------
    # ------------------------------------------------------------------
    # full-state checkpoint/resume (a capability the reference lacks —
    # SURVEY.md §5 "No mid-run resume")
    @property
    def _last_state_path(self) -> str:
        return os.path.join(self.results_dir, "models", "last_state.msgpack")

    def save_resume_checkpoint(self, epoch: int) -> None:
        from .checkpointing import save_train_state

        save_train_state(
            self._last_state_path,
            self.state,
            metadata={
                "epoch": epoch,
                "best_noisy_weighted_acc": self.best_noisy_weighted_acc,
                "best_clean_weighted_acc": self.best_clean_weighted_acc,
                "patience_counter": self.patience_counter,
                "rng": np.asarray(self._rng).tolist(),
                "anchors": np.asarray(self.anchors).tolist(),
                # carry analysis artifacts so a resumed run writes COMPLETE
                # training_history.json / confirmation_bias_log.json
                "training_history": self.training_history,
                "bias_analysis_log": self.bias_analysis_log,
            },
        )

    def try_resume(self) -> int:
        """Restores the full train state if a resume checkpoint exists;
        returns the epoch to continue from (0 if fresh)."""
        from .checkpointing import restore_train_state

        if not os.path.exists(self._last_state_path):
            return 0
        self.state, meta = restore_train_state(self._last_state_path, self.state)
        if meta:
            self.best_noisy_weighted_acc = meta["best_noisy_weighted_acc"]
            self.best_clean_weighted_acc = meta["best_clean_weighted_acc"]
            self.patience_counter = meta["patience_counter"]
            self._rng = jnp.asarray(np.asarray(meta["rng"], dtype=np.uint32))
            self.anchors = jnp.asarray(np.asarray(meta["anchors"], np.float32))
            if "training_history" in meta:
                self.training_history = meta["training_history"]
            if "bias_analysis_log" in meta:
                self.bias_analysis_log = meta["bias_analysis_log"]
            start = int(meta["epoch"]) + 1
        else:
            start = 0
        logger.info("resumed from %s at epoch %d", self._last_state_path, start)
        return start

    def train(self, resume: bool = False, checkpoint_interval: int = 25) -> Dict:
        cfg = self.cfg
        logger.info(
            "starting %s cross-domain training fold %d (%s)",
            cfg.corpus, self.fold + 1, self.noise_info["display_name"],
        )
        start_epoch = self.try_resume() if resume else 0
        for epoch in range(start_epoch, cfg.epochs):
            avg = self.train_epoch(epoch)
            for k, v in avg.items():
                self.training_history[k].append(v)
            if checkpoint_interval and (epoch + 1) % checkpoint_interval == 0:
                self.save_resume_checkpoint(epoch)

            should_validate = (epoch + 1) % cfg.validation_interval == 0 or not self.is_warmup(epoch)
            if not should_validate:
                continue
            clean_results = self.validate(self.clean_val, "Clean", epoch)
            noisy_results = self.validate(self.noisy_val, "Noisy", epoch)
            is_best = (
                noisy_results["weighted_accuracy"]
                > self.best_noisy_weighted_acc + cfg.min_delta
            )
            if is_best:
                self.best_noisy_weighted_acc = noisy_results["weighted_accuracy"]
                self.best_clean_weighted_acc = clean_results["weighted_accuracy"]
            self.save_checkpoint(epoch, clean_results, noisy_results, is_best)
            logger.info(
                "epoch %d/%d | total %.4f ce %.4f kd %.4f ecda %.4f | noisy WA %.2f%%%s",
                epoch + 1, cfg.epochs, avg.get("total_loss", 0),
                avg.get("supervised_ce_loss", 0), avg.get("consistency_loss", 0),
                avg.get("ecda_loss", 0), noisy_results["weighted_accuracy"],
                " *best*" if is_best else "",
            )
            if self.check_early_stopping(noisy_results, is_best):
                logger.info("early stopping triggered")
                break

        self._save_analysis_data()
        final = self._evaluate_on_test_set()
        out = {
            "best_noisy_weighted_acc": self.best_noisy_weighted_acc,
            "results_dir": self.results_dir,
        }
        if final is not None:
            # best-checkpoint test metrics (None when no best was ever saved)
            out["clean_test"], out["noisy_test"] = final
        return out

    def _save_analysis_data(self):
        dump_json(
            dict(self.training_history),
            os.path.join(self.results_dir, "reports", "training_history.json"),
        )
        if self.bias_analysis_log:
            dump_json(
                self.bias_analysis_log,
                os.path.join(self.results_dir, "reports", "confirmation_bias_log.json"),
            )

    def final_summary(self) -> Dict:
        return {
            "fold": self.fold + 1,
            "noise": self.noise_info["display_name"],
            "best_noisy_weighted_acc": self.best_noisy_weighted_acc,
            "best_clean_weighted_acc": self.best_clean_weighted_acc,
            "results_dir": self.results_dir,
        }

    def _evaluate_on_test_set(self):
        best_path = os.path.join(
            self.results_dir, "models", f"{self.cfg.corpus}_cross_domain_best.pth"
        )
        if not os.path.exists(best_path):
            # reference train.py:704-707: warn and skip — evaluating
            # last-epoch weights would masquerade as a best-model result
            logger.warning("no best checkpoint at %s; skipping test-set "
                           "evaluation", best_path)
            return None
        from ..models.convert import load_torch_file

        self.state = self.state._replace(
            ssrl=torch_state_dict_to_ssrl(load_torch_file(best_path))
        )
        clean_test = self.validate(self.clean_test, "Clean_Test")
        noisy_test = self.validate(self.noisy_test, "Noisy_Test")
        logger.info(
            "final test | clean WA %.2f%% | noisy WA %.2f%%",
            clean_test["weighted_accuracy"], noisy_test["weighted_accuracy"],
        )
        best_detailed_results(
            self.results_dir, self.noise_info, self.fold, 999,
            clean_test, noisy_test, self.class_names, is_best=False,
        )
        save_confusion_matrices(
            self.results_dir, clean_test, noisy_test, 999, self.class_names,
            self.noise_info["display_name"],
        )
        final_test_report(
            self.results_dir, self.noise_info, self.fold,
            clean_test, noisy_test, self.best_noisy_weighted_acc,
        )
        return clean_test, noisy_test


def run_cv(
    cfg: DADConfig,
    folds: Optional[Iterable[int]] = None,
    experiment_name: Optional[str] = None,
    clean_store: Optional[FeatureStore] = None,
    noisy_store: Optional[FeatureStore] = None,
    pretrain_params: Optional[dict] = None,
    scan_chunk: int = 0,
    prefetch_depth: int = 2,
    transfer_dtype: Optional[str] = None,
    mesh=None,
    resident=False,
) -> Dict:
    """Full K-fold cross-validation sweep with an aggregate summary report.

    The reference's ``main()`` runs one fold at a time (train.py:765-789,
    fold = N_FOLDS - 1, with a try/except keeping the sweep alive); this
    driver runs all folds and writes the ``final_summary_report.json`` the
    reference left commented out (train.py:797-800).
    """
    n_folds = {"iemocap": 5, "casia": 4, "emodb": 10}[cfg.corpus]
    folds = list(folds) if folds is not None else list(range(n_folds))
    all_results = []
    for fold in folds:
        try:
            trainer = CrossDomainTrainer(
                cfg,
                fold=fold,
                experiment_name=experiment_name,
                clean_store=clean_store,
                noisy_store=noisy_store,
                pretrain_params=pretrain_params,
                scan_chunk=scan_chunk,
                prefetch_depth=prefetch_depth,
                transfer_dtype=transfer_dtype,
                mesh=mesh,
                resident=resident,
            )
            trainer.train()
            all_results.append(trainer.final_summary())
        except Exception as e:  # keep the sweep alive (train.py:786-789)
            logger.error("fold %d failed: %s", fold + 1, e, exc_info=True)
            all_results.append({"fold": fold + 1, "error": str(e)})
    ok = [r for r in all_results if "error" not in r]
    summary = {
        "noise": extract_noise_info(cfg.noisy_data_dir)["display_name"],
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
