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
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_END = object()


class _WorkerError:
    def __init__(self, exc: BaseException):
        self.exc = exc


def prefetch(
    iterable: Iterable[T],
    depth: int = 2,
    to_device: bool = False,
) -> Iterator[T]:
    """Yields items from ``iterable``, produced ``depth`` items ahead on a
    background thread.

    ``to_device=True`` additionally ``jax.device_put``s every array leaf from
    the worker thread, so the host→device copy of batch N+1 overlaps the
    device compute of batch N (JAX transfers are async; issuing them off the
    consumer thread keeps the consumer free to dispatch the next step).
    ``depth <= 0`` degrades to plain synchronous iteration.
    """
    if depth <= 0:
        yield from iterable
        return

    if to_device:
        import jax

    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def _put(item) -> bool:
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
                    item = jax.tree_util.tree_map(jax.device_put, item)
                if not _put(item):
                    return
        except BaseException as e:  # propagate to the consumer
            _put(_WorkerError(e))
            return
        _put(_END)

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
