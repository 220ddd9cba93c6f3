"""Ablation suites (reference run_ablation_studies*.py and
run_granular_ablations*.py).

- STANDARD_ABLATIONS: module on/off switches + the noise-condition sweep
  (4 noise types x 4 SNRs via NOISY_DATA_DIR swaps,
  run_ablation_studies_iemocap.py:83-161).
- GRANULAR_ABLATIONS: per-mechanism toggles inside DACP/ECDA
  (run_granular_ablations.py:73-120).

Each entry is {name: override-dict}; override keys accept the reference's
UPPER_SNAKE constant names (configs.apply_overrides routes them).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Iterable, List, Mapping, Optional

import numpy as np

from ..configs import DADConfig
from ..utils import dump_json, get_logger
from .runner import run_single_experiment

logger = get_logger(__name__)

STANDARD_ABLATIONS: Dict[str, Dict[str, Any]] = {
    "full_method": {},
    "no_dacp": {"USE_DACP": False},
    "no_ecda": {"USE_ECDA": False, "WEIGHT_ECDA": 0.0},
    "no_dacp_no_ecda": {"USE_DACP": False, "USE_ECDA": False, "WEIGHT_ECDA": 0.0},
    "fixed_threshold_090": {"USE_DACP": False, "FIXED_CONFIDENCE_THRESHOLD": 0.9},
    "fixed_threshold_075": {"USE_DACP": False, "FIXED_CONFIDENCE_THRESHOLD": 0.75},
}

GRANULAR_ABLATIONS: Dict[str, Dict[str, Any]] = {
    "full_method": {},
    "no_entropy_score": {"USE_ENTROPY_IN_SCORE": False},
    "global_mmd": {"USE_CLASS_AWARE_MMD": False,
                   "ECDA_COMPACTNESS_WEIGHT_GAMMA": 0.0,
                   "ECDA_REPULSION_WEIGHT_DELTA": 0.0},
    "no_compactness": {"ECDA_COMPACTNESS_WEIGHT_GAMMA": 0.0},
    "no_repulsion": {"ECDA_REPULSION_WEIGHT_DELTA": 0.0},
    "no_anchor_calibration": {"ANCHOR_CALIBRATION_ENABLED": False},
    "no_progressive_weights": {"PROGRESSIVE_TRAINING": False},
}

NOISE_GRID_TYPES = ("babble", "f16", "factory", "volvo")
NOISE_GRID_SNRS = (0, 10, 15, 20)


def noise_condition_experiments(noisy_root: str) -> Dict[str, Dict[str, Any]]:
    """NOISY_DATA_DIR swaps across the noise grid (root1 trees)."""
    out = {}
    for ntype in NOISE_GRID_TYPES:
        for snr in NOISE_GRID_SNRS:
            name = f"{ntype}_{snr}db"
            out[name] = {
                "NOISY_DATA_DIR": os.path.join(noisy_root, f"root1-{ntype}-{snr}db")
            }
    return out


def run_ablation_suite(
    base_cfg: DADConfig,
    experiments: Mapping[str, Mapping[str, Any]],
    fold: int = 0,
    output_path: str = "ablation_results.json",
    clean_store=None,
    noisy_store=None,
    pretrain_params=None,
) -> List[Dict[str, Any]]:
    results = []
    for name, overrides in experiments.items():
        try:
            res = run_single_experiment(
                base_cfg, name, overrides, fold,
                clean_store=clean_store, noisy_store=noisy_store,
                pretrain_params=pretrain_params,
            )
        except Exception as e:  # keep the sweep alive (reference behavior)
            logger.error("experiment %s failed: %s", name, e)
            res = {"name": name, "overrides": dict(overrides), "error": str(e)}
        results.append(res)
    dump_json(results, output_path)
    _write_markdown_table(results, output_path.replace(".json", ".md"))
    return results


def _write_markdown_table(results: List[Dict[str, Any]], path: str) -> None:
    lines = [
        "| experiment | noisy WA (%) | noisy W-F1 (%) | clean WA (%) | best epoch |",
        "|---|---|---|---|---|",
    ]
    for r in results:
        if "error" in r:
            lines.append(f"| {r['name']} | FAILED | - | - | - |")
        else:
            lines.append(
                f"| {r['name']} | {r.get('noisy_wa', float('nan')):.2f} | "
                f"{r.get('noisy_wf1', float('nan')):.2f} | "
                f"{r.get('clean_wa', float('nan')):.2f} | {r.get('epoch', '-')} |"
            )
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def run_experiment_on_multiple_noises(
    base_cfg: DADConfig,
    name: str,
    overrides: Mapping[str, Any],
    noisy_dirs: Iterable[str],
    fold: int = 0,
    **kw,
) -> Dict[str, Any]:
    """Averages one mechanism-ablation across noise conditions
    (run_granular_ablations.py:73-120)."""
    was, wf1s, per_noise = [], [], {}
    for nd in noisy_dirs:
        ov = dict(overrides)
        ov["NOISY_DATA_DIR"] = nd
        res = run_single_experiment(base_cfg, f"{name}_{os.path.basename(nd)}", ov, fold, **kw)
        if "noisy_wa" in res:
            was.append(res["noisy_wa"])
            wf1s.append(res["noisy_wf1"])
        per_noise[os.path.basename(nd)] = res
    return {
        "name": name,
        "mean_noisy_wa": float(np.mean(was)) if was else None,
        "mean_noisy_wf1": float(np.mean(wf1s)) if wf1s else None,
        "per_noise": per_noise,
    }
