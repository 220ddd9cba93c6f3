"""Experiment runner: one named experiment = one config-override dict.

Replaces the reference's importlib.reload + setattr flag system
(run_ablation_studies_iemocap.py:14-67) with ``apply_overrides`` on the
frozen config tree. Results are scraped from the same
``BEST_detailed_results_epoch_*.json`` contract the reference harness uses.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Mapping, Optional

from ..configs import DADConfig, apply_overrides
from ..train.dad_trainer import CrossDomainTrainer
from ..utils import get_logger

logger = get_logger(__name__)


def scrape_best_results(results_dir: str) -> Optional[Dict[str, Any]]:
    """Parses WA / W-F1 out of the newest BEST_detailed_results json
    (reference run_ablation_studies_iemocap.py:50-67)."""
    pattern = os.path.join(results_dir, "reports", "BEST_detailed_results_epoch_*.json")
    files = sorted(glob.glob(pattern), key=os.path.getmtime)
    if not files:
        return None
    with open(files[-1], encoding="utf-8") as f:
        data = json.load(f)
    summary = data["summary"]["noisy"]
    return {
        "epoch": data["info"]["epoch"],
        "noisy_wa": float(summary["w_acc"].rstrip("%")),
        "noisy_wf1": float(summary["w_f1"].rstrip("%")),
        "clean_wa": float(data["summary"]["clean"]["w_acc"].rstrip("%")),
        "source": files[-1],
    }


def run_single_experiment(
    base_cfg: DADConfig,
    name: str,
    overrides: Mapping[str, Any],
    fold: int = 0,
    clean_store=None,
    noisy_store=None,
    pretrain_params=None,
) -> Dict[str, Any]:
    cfg = apply_overrides(base_cfg, overrides)
    # a data-dir override is silently dead when a preloaded store is passed
    # (the trainer only reads cfg.*_data_dir with store=None) — every noise
    # condition would train on the same data while labeled differently
    if noisy_store is not None and "NOISY_DATA_DIR" in overrides:
        logger.info("NOISY_DATA_DIR override: reloading noisy store from %s",
                    cfg.noisy_data_dir)
        noisy_store = None
    if clean_store is not None and "CLEAN_DATA_DIR" in overrides:
        logger.info("CLEAN_DATA_DIR override: reloading clean store from %s",
                    cfg.clean_data_dir)
        clean_store = None
    logger.info("=== experiment %s (fold %d) overrides=%s ===", name, fold + 1, dict(overrides))
    trainer = CrossDomainTrainer(
        cfg,
        fold=fold,
        experiment_name=name,
        clean_store=clean_store,
        noisy_store=noisy_store,
        pretrain_params=pretrain_params,
    )
    out = trainer.train()
    scraped = scrape_best_results(out["results_dir"]) or {}
    return {
        "name": name,
        "overrides": dict(overrides),
        "best_noisy_weighted_acc": out["best_noisy_weighted_acc"],
        "results_dir": out["results_dir"],
        **scraped,
    }
