"""Grid preprocessing driver — the reference's PowerShell pipeline loops as
one command.

Reproduces noisy_preprocessing.ps1 / real_noise_preprocessing.ps1: for each
noise condition in the grid, inject noise over the manifest's wav tree into a
``root1-{type}-{snr}db`` (or ``root2-{snr}db``) sibling tree, verify the
achieved SNR, and extract features into a matching feature directory.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

from ..audio.cli import inject
from ..utils import get_logger

logger = get_logger(__name__)


def run_noise_grid(
    manifest_dir: str,
    clean_root: str,
    output_base: str,
    snrs: Sequence[float],
    noise_types: Optional[Sequence[str]] = None,  # None => white noise
    noise_root: Optional[str] = None,
    root2: bool = False,
    checkpoint: Optional[str] = None,
    features_base: Optional[str] = None,
    verify: bool = True,
    seed: int = 42,
    engine: str = "numpy",
    encoder_cfg=None,
) -> List[Dict]:
    """Returns one record per condition: {name, wav_dir, feature_dir}.

    ``encoder_cfg`` (EncoderConfig) configures the extraction encoder when a
    ``checkpoint`` is given; default is the full-size emotion2vec config."""
    import argparse

    typed = [t for t in (noise_types or []) if t not in (None, "white")]
    if (typed or root2) and not noise_root:
        # without the NOISEX bank the injector would fall back to WHITE noise
        # while the output trees still carry the requested type names —
        # silently mislabeling every downstream result
        raise ValueError(
            "noise_root is required for typed noise conditions "
            f"({typed or 'root2'}); white-noise grids use noise_types=None"
        )

    enc_cfg = enc_params = None
    if checkpoint:
        # load once for the whole grid (the reference's PS loop re-invokes
        # the extraction CLI per condition, re-reading the ~360 MB ckpt)
        from ..configs import EncoderConfig
        from ..models.convert import load_emotion2vec_checkpoint

        enc_cfg = encoder_cfg or EncoderConfig()
        enc_params = load_emotion2vec_checkpoint(checkpoint, enc_cfg)

    results = []
    conditions = []
    if root2:
        conditions = [("root2", None, snr) for snr in snrs]
    elif noise_types:
        conditions = [
            ("root1", ntype, snr) for ntype in noise_types for snr in snrs
        ]
    else:
        conditions = [("root1", "white", snr) for snr in snrs]

    for root_kind, ntype, snr in conditions:
        name = (
            f"root2-{int(snr)}db"
            if root_kind == "root2"
            else f"root1-{ntype}-{int(snr)}db"
        )
        out_root = os.path.join(output_base, name)
        logger.info("=== condition %s ===", name)
        args = argparse.Namespace(
            input_root=clean_root,
            output_root=out_root,
            snr_db=snr,
            manifest_path=os.path.join(manifest_dir, "train.tsv"),
            noise_root=noise_root if (ntype not in (None, "white")) or root2 else None,
            noise_mode="random" if root2 else "type_specific",
            noise_type=ntype or "babble",
            seed=seed,
            verify=verify,
            tolerance=2.0,
            engine=engine,
            threads=0,
        )
        rc = inject(args)
        if rc not in (0, 2):  # 2 = verification warning
            raise RuntimeError(f"injection failed for {name}")

        record = {"name": name, "wav_dir": out_root, "feature_dir": None}
        if checkpoint:
            from ..models.extract import extract_manifest

            # manifest for the noisy tree: same relpaths, new root
            noisy_manifest = os.path.join(output_base, f"manifest-{name}")
            os.makedirs(noisy_manifest, exist_ok=True)
            with open(os.path.join(manifest_dir, "train.tsv"), encoding="utf-8") as f:
                lines = f.read().split("\n")
            with open(
                os.path.join(noisy_manifest, "train.tsv"), "w", encoding="utf-8"
            ) as f:
                print(out_root, file=f)
                for line in lines[1:]:
                    if line.strip():
                        print(line, file=f)
            for ext in (".emo", ".lbl", ".spk"):
                src = os.path.join(manifest_dir, "train" + ext)
                if os.path.exists(src):
                    with open(src, encoding="utf-8") as fi, open(
                        os.path.join(noisy_manifest, "train" + ext), "w",
                        encoding="utf-8",
                    ) as fo:
                        fo.write(fi.read())

            feat_dir = os.path.join(features_base or output_base, f"features-{name}")
            extract_manifest(noisy_manifest, feat_dir, enc_cfg, enc_params)
            record["feature_dir"] = feat_dir
        results.append(record)
    return results
