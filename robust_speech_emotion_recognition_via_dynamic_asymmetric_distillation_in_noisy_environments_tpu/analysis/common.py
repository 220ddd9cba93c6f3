"""Shared plotting/loading helpers for the analysis suite."""

from __future__ import annotations

import json
import os
from typing import Optional


def load_history(results_dir: str) -> dict:
    path = os.path.join(results_dir, "reports", "training_history.json")
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def load_bias_log(results_dir: str) -> list:
    path = os.path.join(results_dir, "reports", "confirmation_bias_log.json")
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def get_pyplot():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:  # pragma: no cover
        return None


def savefig(fig, out_dir: Optional[str], name: str):
    if out_dir is None:
        return None
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, name)
    fig.savefig(path, dpi=150, bbox_inches="tight")
    return path
