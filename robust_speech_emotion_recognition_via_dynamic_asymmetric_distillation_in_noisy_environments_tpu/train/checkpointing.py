"""Full-train-state checkpointing with mid-run resume.

The reference only persists best model weights (save-only; SURVEY.md §5 —
"No mid-run resume"). Here the COMPLETE state pytree (student + teacher +
optimizer moments + DACP quality/threshold state) round-trips through flax
msgpack, with host-side loop metadata (epoch, best metrics, rng key,
patience) in a JSON sidecar, so a 500-epoch DAD run survives preemption —
table stakes for production TPU training.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from ..utils import dump_json, load_json


def save_train_state(path: str, state: Any, metadata: Optional[Dict] = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.tree.map(np.asarray, state)))
    if metadata is not None:
        dump_json(metadata, path + ".meta.json")


def restore_train_state(path: str, like: Any) -> Tuple[Any, Optional[Dict]]:
    """Restores into the structure of ``like`` (a freshly-initialized state)."""
    with open(path, "rb") as f:
        state = serialization.from_bytes(like, f.read())
    meta_path = path + ".meta.json"
    meta = load_json(meta_path) if os.path.exists(meta_path) else None
    return state, meta
