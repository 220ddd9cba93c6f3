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
from typing import Any, Dict, Iterable, List, Mapping, Optional, Sequence

import numpy as np

from ..configs import DADConfig
from ..utils import dump_json, get_logger
from .runner import run_single_experiment, run_single_fused_experiment

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


def fused_noise_condition_experiments(
    noise_types: Iterable[str] = NOISE_GRID_TYPES,
    snrs: Iterable[float] = NOISE_GRID_SNRS,
) -> Dict[str, Dict[str, Any]]:
    """The reference noise grid (run_ablation_studies_iemocap.py:83-161) as
    FUSED injection-config swaps: each cell that the reference reaches via a
    NOISY_DATA_DIR pointing at an offline-preprocessed `root1-{type}-{snr}db`
    tree becomes an on-device bank-injection setting — no offline trees, no
    per-cell extraction stage (the clean pass is shared across the grid)."""
    out = {}
    for ntype in noise_types:
        for snr in snrs:
            out[f"{ntype}_{int(snr)}db"] = {
                "INJECT_NOISE_MODE": "fixed",
                "INJECT_NOISE_TYPE": ntype,
                "INJECT_SNR_DB": float(snr),
            }
    return out


def parse_injection_cells(spec: str) -> Optional[Dict[str, Dict[str, Any]]]:
    """Parse a fused `--multi-noise` cell spec into injection overrides.

    The literal ``"grid"`` selects the full reference grid (returns None →
    `fused_noise_condition_experiments()` downstream); a comma list of
    ``type@snr`` entries (e.g. ``babble@10,f16@0``) selects an explicit
    subset — the fused analogue of handing run_granular_ablations*.py a
    custom noise_conditions list. Anything else (e.g. a feature-mode dir
    list pasted into fused mode) is an error, NOT the full grid: a typo
    must never silently launch the maximal sweep. Types are validated here
    so a bad cell fails before the expensive shared startup."""
    from ..audio.noise import NOISE_TYPES

    if spec == "grid":
        return None
    cells = {}
    for item in spec.split(","):
        ntype, sep, snr = item.partition("@")
        ntype, snr = ntype.strip(), snr.strip()
        if not sep or not ntype or not snr:
            raise ValueError(
                f"bad injection cell {item!r}; want type@snr "
                "(e.g. babble@10) or the literal 'grid'"
            )
        if ntype not in NOISE_TYPES:
            raise ValueError(f"unknown noise type {ntype!r}; "
                             f"valid: {', '.join(NOISE_TYPES)}")
        # 'g' keeps fractional SNRs distinct ('7.5db') instead of colliding
        # truncated names, and matches the grid's '10db' for integers
        name = f"{ntype}_{format(float(snr), 'g')}db"
        if name in cells:
            raise ValueError(f"duplicate injection cell {name}")
        cells[name] = {
            "INJECT_NOISE_MODE": "fixed",
            "INJECT_NOISE_TYPE": ntype,
            "INJECT_SNR_DB": float(snr),
        }
    return cells


def _md_path(path: str) -> str:
    """Sibling .md path for a results JSON; never the JSON path itself
    (a bare `--output name` must not get its results clobbered by the
    markdown summary)."""
    root, ext = os.path.splitext(path)
    return (root if ext else path) + ".md"


def run_fused_ablation_suite(
    base_cfg: DADConfig,
    experiments: Mapping[str, Mapping[str, Any]],
    manifest_dir: str,
    encoder_cfg,
    enc_params,
    base_fused_cfg=None,
    noise_root: Optional[str] = None,
    fold: int = 0,
    output_path: str = "ablation_results.json",
    pretrain_params=None,
    mesh=None,
    prefetch_depth: int = 2,
    transfer_dtype: Optional[str] = None,
) -> List[Dict[str, Any]]:
    """run_ablation_suite for the fused wav->train mode: same experiment
    dicts (reference UPPER_SNAKE knobs) plus FUSED_INJECTION_KEYS, same
    results JSON + markdown contract. The fold-independent startup (wav
    decode, clean extraction, fixed noisy domain) is computed ONCE and
    shared across experiments; only injection-overriding cells rebuild the
    noisy val/test domain."""
    from ..train.fused_trainer import (
        _normalize_fused_cfg,
        prepare_fused_shared,
    )
    from .runner import FUSED_INJECTION_KEYS

    base_fused_cfg = _normalize_fused_cfg(
        base_cfg, encoder_cfg, base_fused_cfg, noise_root
    )
    # when EVERY experiment overrides the injection (--suite noise), the
    # base fixed noisy domain would be rebuilt by refresh_noisy_domain
    # before any trainer consumed it — skip that full-corpus extraction
    all_inject = bool(experiments) and all(
        any(k in FUSED_INJECTION_KEYS for k in ov)
        for ov in experiments.values()
    )
    shared = prepare_fused_shared(
        base_cfg, manifest_dir, encoder_cfg, enc_params, base_fused_cfg,
        noise_root, mesh=mesh, skip_noisy=all_inject,
    )
    results = []
    for name, overrides in experiments.items():
        try:
            res = run_single_fused_experiment(
                base_cfg, name, overrides, manifest_dir, encoder_cfg,
                enc_params, base_fused_cfg=base_fused_cfg,
                noise_root=noise_root, fold=fold, shared=shared,
                pretrain_params=pretrain_params, mesh=mesh,
                prefetch_depth=prefetch_depth, transfer_dtype=transfer_dtype,
            )
        except Exception as e:  # keep the sweep alive (reference behavior)
            logger.error("fused experiment %s failed: %s", name, e,
                         exc_info=True)
            res = {"name": name, "overrides": dict(overrides), "error": str(e)}
        results.append(res)
    dump_json(results, output_path)
    _write_markdown_table(results, _md_path(output_path))
    return results


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
    _write_markdown_table(results, _md_path(output_path))
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


def run_fused_experiment_on_multiple_noises(
    base_cfg: DADConfig,
    name: str,
    overrides: Mapping[str, Any],
    manifest_dir: str,
    encoder_cfg,
    enc_params,
    cells: Optional[Mapping[str, Mapping[str, Any]]] = None,
    base_fused_cfg=None,
    noise_root: Optional[str] = None,
    fold: int = 0,
    shared=None,
    **kw,
) -> Dict[str, Any]:
    """run_experiment_on_multiple_noises for the fused mode: one mechanism
    ablation averaged across injection-config cells (default: the full
    reference noise grid, fused_noise_condition_experiments). ``shared`` is
    a prepare_fused_shared dict to reuse across cells (each cell still
    rebuilds its own fixed noisy val/test domain)."""
    cells = cells if cells is not None else fused_noise_condition_experiments()
    per_noise = {}
    for cell_name, inj in cells.items():
        ov = dict(overrides)
        ov.update(inj)
        try:
            res = run_single_fused_experiment(
                base_cfg, f"{name}_{cell_name}", ov, manifest_dir,
                encoder_cfg, enc_params, base_fused_cfg=base_fused_cfg,
                noise_root=noise_root, fold=fold, shared=shared, **kw,
            )
        except Exception as e:
            # per-condition containment (reference
            # run_granular_ablations.py:99-105): one bad cell must not
            # discard the mechanism's other completed conditions
            logger.error("fused cell %s/%s failed: %s", name, cell_name, e,
                         exc_info=True)
            res = {"name": f"{name}_{cell_name}", "error": str(e)}
        per_noise[cell_name] = res
    return _aggregate_multi_noise(name, per_noise)


def _aggregate_multi_noise(name: str, per_noise: Dict[str, Dict[str, Any]]):
    was = [r["noisy_wa"] for r in per_noise.values() if "noisy_wa" in r]
    wf1s = [r["noisy_wf1"] for r in per_noise.values() if "noisy_wf1" in r]
    return {
        "name": name,
        "mean_noisy_wa": float(np.mean(was)) if was else None,
        "mean_noisy_wf1": float(np.mean(wf1s)) if wf1s else None,
        "per_noise": per_noise,
    }


def _write_multi_noise_markdown(results: List[Dict[str, Any]], path: str) -> None:
    lines = [
        "| experiment | mean noisy WA (%) | mean noisy W-F1 (%) | conditions |",
        "|---|---|---|---|",
    ]
    for r in results:
        if "error" in r:
            lines.append(f"| {r['name']} | FAILED | - | - |")
            continue
        wa = r.get("mean_noisy_wa")
        wf1 = r.get("mean_noisy_wf1")
        lines.append(
            f"| {r['name']} | "
            f"{'-' if wa is None else format(wa, '.2f')} | "
            f"{'-' if wf1 is None else format(wf1, '.2f')} | "
            f"{len(r.get('per_noise', {}))} |"
        )
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def run_multi_noise_suite(
    base_cfg: DADConfig,
    experiments: Mapping[str, Mapping[str, Any]],
    noisy_dirs: Sequence[str],
    fold: int = 0,
    output_path: str = "granular_multi_noise_results.json",
    **kw,
) -> List[Dict[str, Any]]:
    """The reference run_granular_ablations*.py main loop: every mechanism
    ablation averaged over several noise conditions (feature-level,
    NOISY_DATA_DIR swaps), with the sweep-alive error handling and a
    summary table."""
    results = []
    for name, overrides in experiments.items():
        try:
            res = run_experiment_on_multiple_noises(
                base_cfg, name, overrides, noisy_dirs, fold, **kw
            )
        except Exception as e:
            logger.error("multi-noise experiment %s failed: %s", name, e)
            res = {"name": name, "overrides": dict(overrides), "error": str(e)}
        results.append(res)
    dump_json(results, output_path)
    _write_multi_noise_markdown(results, _md_path(output_path))
    return results


def run_fused_multi_noise_suite(
    base_cfg: DADConfig,
    experiments: Mapping[str, Mapping[str, Any]],
    manifest_dir: str,
    encoder_cfg,
    enc_params,
    cells: Optional[Mapping[str, Mapping[str, Any]]] = None,
    base_fused_cfg=None,
    noise_root: Optional[str] = None,
    fold: int = 0,
    output_path: str = "granular_multi_noise_results.json",
    **kw,
) -> List[Dict[str, Any]]:
    """run_multi_noise_suite over the FUSED mode: cells default to the full
    reference noise grid as on-device injection swaps.

    Loop order is cells OUTER, mechanisms inner: each cell's fixed noisy
    val/test domain is injected + extracted ONCE and shared across every
    mechanism (C extraction passes instead of M*C — extraction is the
    dominant harness cost on a tunnel-attached chip), while memory stays
    bounded at one refreshed domain. The base startup skips its own noisy
    domain entirely (every cell overrides the injection, so it would never
    be consumed). Mechanism overrides must be pure DAD knobs; a cell's
    injection always wins (the same precedence as the merge order in
    run_fused_experiment_on_multiple_noises)."""
    from dataclasses import replace

    from ..train.fused_trainer import (
        _normalize_fused_cfg,
        prepare_fused_shared,
        refresh_noisy_domain,
    )
    from .runner import split_fused_overrides

    cells = cells if cells is not None else fused_noise_condition_experiments()
    base_fused_cfg = _normalize_fused_cfg(
        base_cfg, encoder_cfg, base_fused_cfg, noise_root
    )
    shared = prepare_fused_shared(
        base_cfg, manifest_dir, encoder_cfg, enc_params, base_fused_cfg,
        noise_root, mesh=kw.get("mesh"), skip_noisy=True,
    )
    per = {name: {} for name in experiments}
    for cell_name, inj in cells.items():
        try:
            _, inj_repl = split_fused_overrides(inj)
            cell_fused = _normalize_fused_cfg(
                base_cfg, encoder_cfg, replace(base_fused_cfg, **inj_repl),
                noise_root,
            )
            cell_shared = refresh_noisy_domain(shared, cell_fused, noise_root)
            # keep any bank loaded by the first refresh for later cells
            shared["noise_clips"] = cell_shared["noise_clips"]
        except Exception as e:
            logger.error("multi-noise cell %s failed to build: %s",
                         cell_name, e, exc_info=True)
            for name in experiments:
                per[name][cell_name] = {"name": f"{name}_{cell_name}",
                                        "error": str(e)}
            continue
        for name, overrides in experiments.items():
            dad_ov, mech_inj = split_fused_overrides(overrides)
            if mech_inj:
                logger.warning(
                    "experiment %s carries injection overrides %s — "
                    "ignored: the multi-noise cell's injection wins",
                    name, sorted(mech_inj),
                )
            try:
                res = run_single_fused_experiment(
                    base_cfg, f"{name}_{cell_name}", dad_ov, manifest_dir,
                    encoder_cfg, enc_params, base_fused_cfg=cell_fused,
                    noise_root=noise_root, fold=fold, shared=cell_shared,
                    **kw,
                )
            except Exception as e:
                logger.error("fused cell %s/%s failed: %s", name, cell_name,
                             e, exc_info=True)
                res = {"name": f"{name}_{cell_name}", "error": str(e)}
            per[name][cell_name] = res
    results = [_aggregate_multi_noise(name, per[name]) for name in experiments]
    dump_json(results, output_path)
    _write_multi_noise_markdown(results, _md_path(output_path))
    return results


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
    per_noise = {}
    for nd in noisy_dirs:
        ov = dict(overrides)
        ov["NOISY_DATA_DIR"] = nd
        cell = os.path.basename(nd)
        try:
            res = run_single_experiment(base_cfg, f"{name}_{cell}", ov,
                                        fold, **kw)
        except Exception as e:
            # per-condition containment (run_granular_ablations.py:99-105)
            logger.error("cell %s/%s failed: %s", name, cell, e)
            res = {"name": f"{name}_{cell}", "error": str(e)}
        per_noise[cell] = res
    return _aggregate_multi_noise(name, per_noise)
