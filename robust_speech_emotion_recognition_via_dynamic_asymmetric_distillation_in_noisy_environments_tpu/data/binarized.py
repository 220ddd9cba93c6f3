"""Packed (binarized) raw-audio store for d2v pretraining.

The fairseq task the reference inherits can read a pre-binarized indexed
dataset instead of per-file wavs (``BinarizedAudioDataset``, reference
upstream/tasks/audio_pretraining.py:144-156; gated by the
``binarized_dataset`` task knob — the reference's own entry points never
turn it on). The TPU-native analogue here is deliberately simple and
mmap-friendly:

- ``pack_manifest`` decodes every wav of a manifest ONCE into one
  contiguous ``<split>.bin`` of mono float32 samples plus a ``<split>.idx.npz``
  index (per-clip lengths; offsets are the cumsum). Decode cost and
  per-file filesystem metadata are paid at pack time, not every epoch.
- ``BinarizedWavDataset`` is a drop-in for ``WavCropDataset``: identical
  epoch composition, shuffling, crop draws and normalization (it reuses the
  base class's ``batches`` wholesale and only swaps the clip reader for an
  ``np.memmap`` slice), so a packed run is bit-identical to the wav-manifest
  run it was packed from (tests/test_binarized.py).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..audio.wavio import read_mono
from ..train.d2v_pretrain import WavCropDataset  # no cycle: train/ never imports this module
from ..utils import get_logger
from .manifests import read_manifest

logger = get_logger(__name__)

_FORMAT_VERSION = 1


def pack_manifest(
    manifest_dir: str,
    out_dir: str,
    split: str = "train",
    sample_rate: int = 16_000,
) -> Tuple[int, int]:
    """Packs ``<manifest_dir>/<split>.tsv``'s wavs into
    ``<out_dir>/<split>.bin`` + ``<split>.idx.npz``. Returns
    (n_clips, total_samples). Multi-channel audio is mono-mixed exactly like
    the wav-manifest loader."""
    root, files = read_manifest(manifest_dir, split)
    os.makedirs(out_dir, exist_ok=True)
    bin_path = os.path.join(out_dir, f"{split}.bin")
    lengths: List[int] = []
    manifest_frames: List[int] = []
    with open(bin_path, "wb") as out:
        for rel, frames in files:
            path = os.path.join(root, rel)
            clip = np.ascontiguousarray(read_mono(path, sample_rate))
            out.write(clip.tobytes())
            lengths.append(len(clip))
            manifest_frames.append(int(frames))
    np.savez(
        os.path.join(out_dir, f"{split}.idx.npz"),
        lengths=np.asarray(lengths, np.int64),
        # the tsv frames column verbatim (possibly -1 or stale) — the
        # min_sample_size filter must key off THIS, exactly like
        # WavCropDataset, or packed epochs diverge from wav-manifest ones
        manifest_frames=np.asarray(manifest_frames, np.int64),
        sample_rate=np.int64(sample_rate),
        version=np.int64(_FORMAT_VERSION),
    )
    # carry the label/speaker sidecars along so the packed dir is a full
    # training source (fused trainer wav stores read them too)
    import shutil

    for ext in (".emo", ".lbl", ".spk"):
        src = os.path.join(manifest_dir, split + ext)
        if os.path.exists(src):
            shutil.copy2(src, os.path.join(out_dir, split + ext))
    total = int(sum(lengths))
    logger.info(
        "packed %d clips (%d samples, %.1f MB) -> %s",
        len(lengths), total, total * 4 / 1e6, bin_path,
    )
    return len(lengths), total


def is_packed_dir(d: str, split: str = "train") -> bool:
    return os.path.exists(os.path.join(d, f"{split}.idx.npz"))


class BinarizedWavDataset(WavCropDataset):
    """``WavCropDataset`` over packed stores (see module docstring).

    ``packed_dirs`` are directories produced by ``pack_manifest``; several
    mix with the same fractional ``weights`` semantics as wav manifests.
    Epoch composition is decided by the SAME predicate as the wav-manifest
    dataset — the manifest tsv's frames column (including its frames<0
    keep-all convention), recorded at pack time — so a packed run is
    bit-identical to the run it was packed from even when the tsv frames
    disagree with the real wav lengths."""

    def __init__(
        self,
        packed_dirs: Sequence[str],
        pcfg,
        split: str = "train",
        weights: Optional[Sequence[float]] = None,
    ):
        self.pcfg = pcfg
        self.base_lists = []
        self._mmaps = []
        self._offsets = []
        for di, d in enumerate(packed_dirs):
            idx_path = os.path.join(d, f"{split}.idx.npz")
            if not os.path.exists(idx_path):
                raise FileNotFoundError(
                    f"{idx_path} not found — run `cli d2v-pack` first "
                    "(or pass a wav manifest dir without --binarized)"
                )
            idx = np.load(idx_path)
            sr = int(idx["sample_rate"])
            if sr != pcfg.sample_rate:
                raise ValueError(
                    f"{d}: packed at {sr} Hz != task {pcfg.sample_rate}"
                )
            lengths = idx["lengths"].astype(np.int64)
            if "manifest_frames" in idx:
                frames = idx["manifest_frames"].astype(np.int64)
            else:  # stores packed before the frames column was recorded
                frames = lengths
            offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])
            mm = np.memmap(
                os.path.join(d, f"{split}.bin"), np.float32, mode="r"
            )
            if mm.shape[0] != int(lengths.sum()):
                raise ValueError(
                    f"{d}/{split}.bin size {mm.shape[0]} != index total "
                    f"{int(lengths.sum())} (re-pack the store)"
                )
            self._mmaps.append(mm)
            self._offsets.append(offsets)
            kept = [
                ((di, ci), int(lengths[ci]))
                # WavCropDataset's exact filter, on the manifest frames
                for ci, f in enumerate(frames)
                if f < 0 or f >= pcfg.min_sample_size
            ]
            skipped = len(lengths) - len(kept)
            if skipped:
                logger.info(
                    "%s: skipped %d clips under min_sample_size=%d",
                    d, skipped, pcfg.min_sample_size,
                )
            self.base_lists.append(kept)
        self._init_weights(weights)

    def _load_audio(self, entry) -> np.ndarray:
        (di, ci), n = entry
        off = int(self._offsets[di][ci])
        return np.asarray(self._mmaps[di][off : off + n], np.float32)
