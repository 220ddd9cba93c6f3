"""ctypes bridge to the native (C++) feature-store batcher.

Builds ``native/libdadtpu_native.so`` on demand with g++ and exposes a
mmap-backed store plus multithreaded padded-batch assembly. Falls back
gracefully (callers check ``native_available()``): the pure-numpy path in
``batching.py`` is the reference semantics, this is the fast host path that
keeps a ~1k clips/s TPU step fed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from ..utils import get_logger

logger = get_logger(__name__)

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libdadtpu_native.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH):
        src = os.path.join(_NATIVE_DIR, "batcher.cc")
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                check=True,
                capture_output=True,
            )
        except (subprocess.CalledProcessError, OSError) as e:
            logger.warning("native batcher build failed, using numpy path: %s", e)
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError as e:
        logger.warning("native batcher load failed: %s", e)
        return None

    lib.store_open.restype = ctypes.c_int64
    lib.store_open.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
    ]
    lib.store_wrap.restype = ctypes.c_int64
    lib.store_wrap.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
    ]
    lib.store_close.argtypes = [ctypes.c_int64]
    lib.batch_assemble.restype = ctypes.c_int
    lib.batch_assemble.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32,
    ]
    if not hasattr(lib, "inject_files"):
        # stale .so from a build before the inject engine existed; rebuild.
        # The running process keeps the old handle (dlopen caches by path),
        # so the injector stays unavailable here but fresh processes get it.
        try:
            subprocess.run(
                ["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                check=True,
                capture_output=True,
            )
            lib = ctypes.CDLL(_SO_PATH)
        except (subprocess.CalledProcessError, OSError) as e:  # pragma: no cover
            logger.warning("native library rebuild failed: %s", e)
    if hasattr(lib, "inject_files"):
        lib.inject_files.restype = ctypes.c_int64
        lib.inject_files.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def native_lib() -> Optional[ctypes.CDLL]:
    """Shared handle to the native host-runtime library (or None)."""
    return _load()


def npy_data_offset(path: str) -> int:
    """Byte offset of the data section in a .npy v1/v2 file."""
    with open(path, "rb") as f:
        magic = f.read(6)
        assert magic == b"\x93NUMPY", f"not a npy file: {path}"
        major, _minor = f.read(1)[0], f.read(1)[0]
        if major == 1:
            (hlen,) = np.frombuffer(f.read(2), dtype="<u2")
            return 10 + int(hlen)
        (hlen,) = np.frombuffer(f.read(4), dtype="<u4")
        return 12 + int(hlen)


class NativeStore:
    """C++ batch assembly over a resident float32 array (or an mmap'd .npy
    when constructed via ``from_file``)."""

    def __init__(
        self,
        feats: np.ndarray,
        sizes: np.ndarray,
        offsets: np.ndarray,
        labels: Optional[np.ndarray],
        n_threads: int = 4,
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError("native batcher unavailable")
        self._lib = lib
        self.n_threads = n_threads
        feats = np.ascontiguousarray(feats, dtype=np.float32)
        self._feats = feats  # keep the buffer alive for the C side
        self.dim = int(feats.shape[1])
        self.num = len(sizes)
        self._sizes = np.ascontiguousarray(sizes, dtype=np.int64)
        self._offsets = np.ascontiguousarray(offsets, dtype=np.int64)
        self._labels = (
            np.ascontiguousarray(labels, dtype=np.int32)
            if labels is not None
            else None
        )
        self._handle = lib.store_wrap(
            feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.dim,
            self._sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self._offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self.num,
        )
        if self._handle < 0:
            raise RuntimeError("store_wrap failed")

    @classmethod
    def from_file(
        cls,
        npy_path: str,
        sizes: np.ndarray,
        offsets: np.ndarray,
        labels: Optional[np.ndarray],
        n_threads: int = 4,
    ) -> "NativeStore":
        """mmap the .npy directly (zero-copy for huge stores)."""
        feats = np.load(npy_path, mmap_mode="r")
        if feats.dtype != np.float32:
            # the C side reinterprets raw bytes as float32 — anything else
            # would be silently read as garbage features
            raise ValueError(
                f"{npy_path}: native store needs float32, got {feats.dtype}"
            )
        obj = cls.__new__(cls)
        lib = _load()
        if lib is None:
            raise RuntimeError("native batcher unavailable")
        obj._lib = lib
        obj.n_threads = n_threads
        obj._feats = None
        obj.dim = int(feats.shape[1])
        obj.num = len(sizes)
        obj._sizes = np.ascontiguousarray(sizes, dtype=np.int64)
        obj._offsets = np.ascontiguousarray(offsets, dtype=np.int64)
        obj._labels = (
            np.ascontiguousarray(labels, dtype=np.int32)
            if labels is not None
            else None
        )
        obj._handle = lib.store_open(
            npy_path.encode(),
            npy_data_offset(npy_path),
            int(obj._sizes.sum()),
            obj.dim,
            obj._sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            obj._offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            obj.num,
        )
        if obj._handle < 0:
            raise RuntimeError(f"store_open failed for {npy_path}")
        return obj

    def assemble(self, indices: np.ndarray, t_max: int):
        B = len(indices)
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        feats = np.empty((B, t_max, self.dim), np.float32)
        mask = np.empty((B, t_max), np.uint8)
        labels = np.empty((B,), np.int32)
        valid = np.empty((B,), np.uint8)
        labels_ptr = (
            self._labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
            if self._labels is not None
            else None
        )
        rc = self._lib.batch_assemble(
            self._handle,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            B,
            t_max,
            labels_ptr,
            feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self.n_threads,
        )
        if rc != 0:
            raise RuntimeError("batch_assemble failed")
        return feats, mask.astype(bool), labels, valid.astype(bool)

    def close(self):
        if getattr(self, "_handle", -1) >= 0:
            self._lib.store_close(self._handle)
            self._handle = -1

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
