"""Asynchronous host-side input pipeline (SURVEY §2.5 "async data loading").

The reference overlaps host batch assembly with device compute only in the
pretrain stage, via ``DataLoader(num_workers=4)`` (reference data.py:258-263);
the DAD stage runs synchronously (``num_workers=0``,
dataload_clean.py:281-283). Here :func:`prefetch` wraps ANY batch iterable:
a daemon worker thread assembles batch N+1 (numpy or the native C++ batcher,
see data/native.py) and optionally ``jax.device_put``s it while the device
executes step N. The queue is bounded so host memory stays flat, and the
worker shuts down cleanly if the consumer abandons the iterator early
(e.g. early stopping mid-epoch).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional, TypeVar

T = TypeVar("T")

_END = object()


class _WorkerError:
    def __init__(self, exc: BaseException):
        self.exc = exc


def prefetch(
    iterable: Iterable[T],
    depth: int = 2,
    to_device: bool = False,
    transfer_fp32_as: Optional[str] = None,
) -> Iterator[T]:
    """Yields items from ``iterable``, produced ``depth`` items ahead on a
    background thread.

    ``to_device=True`` additionally ``jax.device_put``s every array leaf from
    the worker thread, so the host→device copy of batch N+1 overlaps the
    device compute of batch N (JAX transfers are async; issuing them off the
    consumer thread keeps the consumer free to dispatch the next step).
    ``depth <= 0`` degrades to plain synchronous iteration.

    ``transfer_fp32_as`` (e.g. ``"bfloat16"``, implies to_device): float32
    leaves are cast host-side to the narrower dtype before the copy and cast
    back to float32 ON DEVICE after — halving host→device bytes, which
    dominates feature-level training when the device hangs off a thin link
    (measured ~60 MB/s on this tunneled attach; PERFORMANCE.md). Opt-in: the
    round-trip quantizes inputs to bf16 precision.
    """
    if to_device or transfer_fp32_as:
        import jax
        import jax.numpy as jnp
        import numpy as np

        narrow = jnp.dtype(transfer_fp32_as) if transfer_fp32_as else None

        def _put(x):
            if (
                narrow is not None
                and getattr(x, "dtype", None) == np.float32
            ):
                y = jax.device_put(np.asarray(x).astype(narrow))
                return y.astype(jnp.float32)  # device-side upcast, async
            return jax.device_put(x)

        to_device = True

    if depth <= 0:
        # synchronous degradation still honors to_device/transfer_fp32_as —
        # depth only controls lookahead, not the transfer path
        if to_device:
            for item in iterable:
                yield jax.tree_util.tree_map(_put, item)
        else:
            yield from iterable
        return

    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def _enqueue(item) -> bool:
        # bounded put that gives up if the consumer went away
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _worker():
        try:
            for item in iterable:
                if to_device:
                    item = jax.tree_util.tree_map(_put, item)
                if not _enqueue(item):
                    return
        except BaseException as e:  # propagate to the consumer
            _enqueue(_WorkerError(e))
            return
        _enqueue(_END)

    t = threading.Thread(target=_worker, daemon=True, name="dadtpu-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, _WorkerError):
                raise item.exc
            yield item
    finally:
        stop.set()
