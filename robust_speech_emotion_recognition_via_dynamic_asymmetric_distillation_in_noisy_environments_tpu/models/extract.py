"""Offline feature extraction: wav manifest -> reference-format feature store.

TPU-native counterpart of emotion2vec_speech_features.py (reference
scripts/): instead of a per-clip python loop over ~5.5k files, clips are
length-bucketed into padded batches and run through the jitted encoder; the
padding-exact batched forward (see models/layers.PositionalConv) guarantees
identical features to the per-clip reference semantics. Output:
``<save_dir>/<split>.npy`` + ``.lengths`` (+ label sidecars copied through),
byte-compatible with the reference's NpyAppendArray layout (float32 rows).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import EncoderConfig
from ..data.manifests import read_manifest
from ..utils import get_logger
from .emotion2vec import Emotion2vecEncoder, normalize_wav
from .layers import conv_out_lengths

logger = get_logger(__name__)


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    top = buckets[-1]
    return int(np.ceil(n / top) * top)


class FeatureExtractor:
    """Batched emotion2vec feature extractor."""

    def __init__(
        self,
        cfg: EncoderConfig,
        params,
        batch_size: int = 16,
        buckets: Sequence[int] = (16000, 32000, 64000, 128000, 256000, 480000),
        mesh=None,
    ):
        """``mesh`` (a jax.sharding.Mesh from parallel.make_mesh) shards the
        extraction forward: batches over dp, encoder params over tp (SURVEY
        §2.5 — extraction is the dominant compute, and it is embarrassingly
        batch-parallel). ``batch_size`` must divide by the dp axis size."""
        self.cfg = cfg
        self.batch_size = batch_size
        self.buckets = tuple(buckets)
        self.mesh = mesh
        self.model = Emotion2vecEncoder(cfg)

        if mesh is not None:
            from ..parallel.mesh import batch_sharding, encoder_param_sharding

            dp = mesh.shape.get("dp", 1)
            if batch_size % dp != 0:
                raise ValueError(
                    f"batch_size={batch_size} must divide by dp={dp}"
                )
            params = jax.device_put(params, encoder_param_sharding(mesh, params))
            in_shardings = (batch_sharding(mesh, 2),) * 2
        else:
            # commit to device ONCE: params flow as jit arguments (remote
            # compile body limit), and a host-resident tree would otherwise
            # re-upload ~360 MB per call over the tunnel
            params = jax.device_put(params)
        self.params = params

        def fwd(p, wav, wav_mask):
            x = normalize_wav(wav, wav_mask) if cfg.normalize_input else wav
            feats, frame_mask = self.model.apply(p, x, wav_mask)
            return feats.astype(jnp.float32), frame_mask

        if mesh is None:
            jitted = jax.jit(fwd)
        else:
            jitted = jax.jit(fwd, in_shardings=(None, *in_shardings))
        self._fwd = lambda wav, mask: jitted(self.params, wav, mask)

    def extract_clips(self, clips: Sequence[np.ndarray]) -> List[np.ndarray]:
        """Extracts features for a list of 1-D waveforms, preserving order."""
        order = np.argsort([len(c) for c in clips], kind="stable")
        results: List[Optional[np.ndarray]] = [None] * len(clips)
        B = self.batch_size
        for start in range(0, len(order), B):
            idx = order[start : start + B]
            group = [clips[i] for i in idx]
            T = _bucket(max(len(c) for c in group), self.buckets)
            wav = np.zeros((B, T), np.float32)
            mask = np.ones((B, T), bool)
            for row, c in enumerate(group):
                wav[row, : len(c)] = c
                mask[row, : len(c)] = False
            feats, frame_mask = self._fwd(jnp.asarray(wav), jnp.asarray(mask))
            feats = np.asarray(feats)
            out_lens = np.asarray(
                conv_out_lengths(
                    jnp.asarray([len(c) for c in group]), self.cfg.conv_feature_layers
                )
            )
            for row, i in enumerate(idx):
                results[int(i)] = feats[row, : out_lens[row]]
        return results  # type: ignore[return-value]


def extract_manifest(
    manifest_dir: str,
    save_dir: str,
    cfg: EncoderConfig,
    params,
    split: str = "train",
    batch_size: int = 16,
    mesh=None,
) -> Tuple[int, int]:
    """Runs extraction over a manifest dir and writes the feature store
    (reference CLI contract: --data/--split/--save-dir)."""
    from ..audio.wavio import read_wav

    root, files = read_manifest(manifest_dir, split)
    extractor = FeatureExtractor(cfg, params, batch_size=batch_size, mesh=mesh)
    os.makedirs(save_dir, exist_ok=True)
    prefix = os.path.join(save_dir, split)

    clips = []
    for rel, _frames in files:
        wav, sr = read_wav(os.path.join(root, rel))
        if wav.ndim == 2:
            wav = np.mean(wav, axis=1)
        assert sr == 16000, f"expected 16 kHz, got {sr} for {rel}"
        clips.append(wav.astype(np.float32))

    feats = extractor.extract_clips(clips)
    flat = np.concatenate([f for f in feats if len(f)], axis=0)
    np.save(prefix + ".npy", flat)
    with open(prefix + ".lengths", "w") as f:
        for x in feats:
            print(len(x), file=f)

    # copy label sidecars alongside, like the reference pipeline keeps them
    for ext in (".emo", ".lbl", ".spk"):
        src = os.path.join(manifest_dir, split + ext)
        if os.path.exists(src):
            with open(src, encoding="utf-8") as fi, open(
                prefix + ext, "w", encoding="utf-8"
            ) as fo:
                fo.write(fi.read())

    logger.info("extracted %d clips -> %s (%d frames)", len(files), save_dir, len(flat))
    return len(files), len(flat)


def main(argv=None):
    """CLI mirroring the reference extractor's interface."""
    import argparse

    from .convert import load_emotion2vec_checkpoint

    p = argparse.ArgumentParser(description="extract emotion2vec features")
    p.add_argument("--data", required=True, help="manifest dir with <split>.tsv")
    p.add_argument("--split", default="train")
    p.add_argument("--checkpoint", required=True, help="fairseq emotion2vec .pt")
    p.add_argument("--save-dir", required=True)
    p.add_argument("--layer", type=int, default=11,
                   help="kept for CLI parity; the features_only path always "
                        "returns the final (12th) block output like the "
                        "reference extraction config")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--encoder-json", default=None,
                   help="JSON dict of EncoderConfig field overrides")
    p.add_argument("--dp", type=int, default=0,
                   help="shard batches over a dp mesh of this size "
                        "(0 = single device)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel split of the encoder (with --dp)")
    args = p.parse_args(argv)

    if args.encoder_json:
        from ..cli import _load_encoder_json

        cfg = EncoderConfig(**_load_encoder_json(args.encoder_json))
    else:
        cfg = EncoderConfig()
    params = load_emotion2vec_checkpoint(args.checkpoint, cfg)
    mesh = None
    if args.dp or args.tp > 1:
        from ..parallel.mesh import make_mesh

        dp = args.dp or 1
        mesh = (make_mesh(dp * args.tp, tp=args.tp) if args.tp > 1
                else make_mesh(dp, axis_names=("dp",)))
    extract_manifest(args.data, args.save_dir, cfg, params, args.split,
                     args.batch_size, mesh=mesh)
    return 0


if __name__ == "__main__":
    main()
