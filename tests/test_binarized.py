"""Packed (binarized) audio store — the BinarizedAudioDataset analogue
(reference upstream/tasks/audio_pretraining.py:144-156).

The load-bearing property: a packed run is BIT-IDENTICAL to the
wav-manifest run it was packed from (same epoch composition, shuffling,
crop draws, normalization), so `--binarized` is purely an IO optimization.
"""

import os

import numpy as np
import pytest

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.binarized import (
    BinarizedWavDataset,
    is_packed_dir,
    pack_manifest,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.d2v_pretrain import (
    WavCropDataset,
)

from test_d2v_pretrain import _write_wav_corpus, tiny_pcfg


def test_packed_batches_bitwise_equal_to_wav_manifest(tmp_path):
    d = _write_wav_corpus(tmp_path)
    out = os.path.join(str(tmp_path), "packed")
    n, total = pack_manifest(d, out)
    assert n == 6 and total == 4000 + 4200 + 5000 + 6000 + 7000 + 9000
    assert is_packed_dir(out)

    pcfg = tiny_pcfg(crop_size=6000, min_sample_size=4500, batch_size=2)
    ds_wav = WavCropDataset([d], pcfg)
    ds_bin = BinarizedWavDataset([out], pcfg)
    assert len(ds_bin) == len(ds_wav) == 4
    for epoch in (0, 1):
        bw = list(ds_wav.batches(epoch, 2))
        bb = list(ds_bin.batches(epoch, 2))
        assert len(bw) == len(bb) == 2
        for (w1, p1), (w2, p2) in zip(bw, bb):
            np.testing.assert_array_equal(w1, w2)
            np.testing.assert_array_equal(p1, p2)


def test_packed_weights_and_skip_match(tmp_path):
    d = _write_wav_corpus(tmp_path)
    out = os.path.join(str(tmp_path), "packed")
    pack_manifest(d, out)
    pcfg = tiny_pcfg(crop_size=5000, min_sample_size=0, batch_size=2)
    ds_wav = WavCropDataset([d, d], pcfg, weights=[1.0, 0.5])
    ds_bin = BinarizedWavDataset([out, out], pcfg, weights=[1.0, 0.5])
    assert len(ds_bin) == len(ds_wav)
    # mid-epoch resume (skip) replays the same tail
    tail_w = list(ds_wav.batches(3, 2, skip=1))
    tail_b = list(ds_bin.batches(3, 2, skip=1))
    for (w1, p1), (w2, p2) in zip(tail_w, tail_b):
        np.testing.assert_array_equal(w1, w2)
        np.testing.assert_array_equal(p1, p2)


def test_packed_filter_uses_manifest_frames(tmp_path):
    """Epoch composition keys off the manifest tsv's frames column exactly
    like WavCropDataset — including frames<0 keep-all and stale frames —
    so packed runs can't silently diverge from the wav runs they mirror."""
    d = _write_wav_corpus(tmp_path)
    # rewrite the tsv with frames=-1 everywhere (no-frames manifests)
    lines = open(os.path.join(d, "train.tsv")).read().splitlines()
    with open(os.path.join(d, "train.tsv"), "w") as f:
        print(lines[0], file=f)
        for row in lines[1:]:
            print(f"{row.split(chr(9))[0]}\t-1", file=f)
    out = os.path.join(str(tmp_path), "packed")
    pack_manifest(d, out)

    # min_sample_size would drop every clip if keyed on real lengths;
    # frames=-1 keeps them all in BOTH datasets
    pcfg = tiny_pcfg(crop_size=5000, min_sample_size=100_000, batch_size=2)
    ds_wav = WavCropDataset([d], pcfg)
    ds_bin = BinarizedWavDataset([out], pcfg)
    assert len(ds_wav) == len(ds_bin) == 6
    for (w1, p1), (w2, p2) in zip(ds_wav.batches(0, 2), ds_bin.batches(0, 2)):
        np.testing.assert_array_equal(w1, w2)
        np.testing.assert_array_equal(p1, p2)


def test_packed_guards(tmp_path):
    d = _write_wav_corpus(tmp_path)
    out = os.path.join(str(tmp_path), "packed")
    pack_manifest(d, out)
    with pytest.raises(FileNotFoundError, match="d2v-pack"):
        BinarizedWavDataset(
            [os.path.join(str(tmp_path), "nope")], tiny_pcfg(min_sample_size=0)
        )
    with pytest.raises(ValueError, match="packed at"):
        BinarizedWavDataset([out], tiny_pcfg(sample_rate=8000, min_sample_size=0))
    # truncated bin file is detected
    bin_path = os.path.join(out, "train.bin")
    with open(bin_path, "r+b") as f:
        f.truncate(os.path.getsize(bin_path) - 8)
    with pytest.raises(ValueError, match="re-pack"):
        BinarizedWavDataset([out], tiny_pcfg(min_sample_size=0))


@pytest.mark.slow
def test_cli_pack_and_binarized_pretrain(tmp_path):
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.cli import (
        main,
    )

    d = _write_wav_corpus(tmp_path, lens=(2000, 2400, 2800, 3000))
    out = os.path.join(str(tmp_path), "packed")
    rc = main(["d2v-pack", "--manifests", d, "--out-dirs", out])
    assert rc == 0
    with pytest.raises(SystemExit):  # main routes ValueError via parser.error
        main(["d2v-pack", "--manifests", d, d, "--out-dirs", out])

    _write_enc_json(tmp_path)
    save = os.path.join(str(tmp_path), "run")
    rc = main([
        "d2v-pretrain", "--binarized", "--manifests", out,
        "--save-dir", save, "--batch-size", "2", "--steps", "2",
        "--warmup-steps", "1", "--crop-size", "2400",
        "--min-sample-size", "0", "--clone-batch", "2",
        "--mask-length", "3", "--fast",
        # --fast picks the v5e defaults; explicit json (incl. dtype
        # float32 for CPU determinism here) must still override them
        "--encoder-json", os.path.join(str(tmp_path), "enc.json"),
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(save, "encoder_params.msgpack"))


def test_wav_store_loads_packed_dir(tmp_path):
    """The fused trainer's WavStore reads packed dirs directly (the .bin IS
    its flat layout), sidecars included — so `dad --from-wav` can consume
    d2v-pack output without re-decoding wavs."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.wavstore import (
        load_wav_store,
    )

    d = _write_wav_corpus(tmp_path)
    labels = ["angry", "happy", "sad", "neutral", "angry", "happy"]
    with open(os.path.join(d, "train.lbl"), "w") as f:
        f.write("\n".join(labels) + "\n")
    with open(os.path.join(d, "train.spk"), "w") as f:
        f.write("\n".join(f"spk_{i % 2}" for i in range(6)) + "\n")
    out = os.path.join(str(tmp_path), "packed")
    pack_manifest(d, out)

    lm = {"angry": 0, "happy": 1, "neutral": 2, "sad": 3}
    a = load_wav_store(d, label_map=lm)
    b = load_wav_store(out, label_map=lm)
    np.testing.assert_array_equal(a.samples, b.samples)
    np.testing.assert_array_equal(a.sizes, b.sizes)
    np.testing.assert_array_equal(a.labels, b.labels)
    np.testing.assert_array_equal(a.groups, b.groups)
    assert a.label_names == b.label_names


def test_encoder_json_inline_or_file(tmp_path):
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.cli import (
        _load_encoder_json,
    )

    inline = '{"embed_dim": 16, "conv_feature_layers": [[8, 4, 2]]}'
    kw = _load_encoder_json(inline)
    assert kw["embed_dim"] == 16
    assert kw["conv_feature_layers"] == ((8, 4, 2),)  # hashable for jit
    p = os.path.join(str(tmp_path), "enc.json")
    with open(p, "w") as f:
        f.write(inline)
    assert _load_encoder_json(p) == kw


def _write_enc_json(tmp_path):
    import json

    cfg = dict(
        embed_dim=16,
        depth=2,
        num_heads=2,
        prenet_depth=1,
        conv_feature_layers=[[8, 4, 2], [8, 3, 2]],
        conv_pos_depth=2,
        conv_pos_width=10,
        conv_pos_groups=2,
        dtype="float32",
    )
    with open(os.path.join(str(tmp_path), "enc.json"), "w") as f:
        json.dump(cfg, f)
