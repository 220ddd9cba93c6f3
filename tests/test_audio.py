import os

import jax
import numpy as np
import pytest

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio import (
    add_real_noise,
    add_white_noise,
    batch_add_white_noise,
    batch_mix_noise_bank,
    estimate_snr,
    read_wav,
    write_wav,
    check_audio_format,
    fix_audio_format,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.noise import (
    add_real_noise_np,
    add_white_noise_np,
    tile_noise_np,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.cli import (
    main as audio_cli_main,
)


def _tone(n=16000, sr=16000, f=440.0, amp=0.3):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float64)


def test_wav_roundtrip(tmp_path):
    x = _tone()
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 16000)
    y, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(x, y, atol=1e-3)


def test_white_noise_snr_np(rng):
    x = _tone()
    for snr in [0, 10, 20]:
        noisy = add_white_noise_np(x, snr, rng)
        achieved = estimate_snr(x, noisy)
        assert abs(achieved - snr) < 1.0


def test_white_noise_snr_jax():
    x = _tone()
    noisy = np.asarray(add_white_noise(x.astype(np.float32), 10.0, jax.random.PRNGKey(0)))
    assert abs(estimate_snr(x, noisy) - 10.0) < 1.0


def test_real_noise_snr():
    rng = np.random.default_rng(1)
    x = _tone()
    noise = rng.normal(size=3000)  # shorter than signal -> tiling path
    tiled = tile_noise_np(noise, len(x))
    noisy = add_real_noise_np(x, tiled, 15.0)
    assert abs(estimate_snr(x, noisy) - 15.0) < 0.5
    # jax path agrees
    noisy_j = np.asarray(
        add_real_noise(x.astype(np.float32), tiled.astype(np.float32), 15.0)
    )
    np.testing.assert_allclose(noisy, noisy_j, atol=1e-4)


def test_peak_normalization():
    x = np.full(1000, 0.95)
    noisy = add_white_noise_np(x, -10.0, np.random.default_rng(0))
    assert np.max(np.abs(noisy)) <= 1.0 + 1e-9


def test_batch_white_noise_masked():
    x = np.zeros((2, 16000), np.float32)
    x[0, :8000] = _tone(8000)
    x[1] = _tone(16000)
    valid = np.zeros((2, 16000), bool)
    valid[0, :8000] = True
    valid[1] = True
    noisy = np.asarray(batch_add_white_noise(x, valid, 10.0, jax.random.PRNGKey(0)))
    # padded region untouched (zero noise)
    assert np.all(noisy[0, 8000:] == 0)
    assert abs(estimate_snr(x[0, :8000], noisy[0, :8000]) - 10.0) < 1.0
    assert abs(estimate_snr(x[1], noisy[1]) - 10.0) < 1.0


def test_batch_noise_bank_modes():
    rng = np.random.default_rng(2)
    x = np.stack([_tone(), _tone(f=220.0)]).astype(np.float32)
    valid = np.ones_like(x, bool)
    bank = rng.normal(size=(5, 8000)).astype(np.float32)
    # root1: fixed type
    noisy = np.asarray(
        batch_mix_noise_bank(x, valid, bank, 10.0, jax.random.PRNGKey(0), noise_type=2)
    )
    for i in range(2):
        assert abs(estimate_snr(x[i], noisy[i]) - 10.0) < 0.8
    # root2: random type per clip (5 dB keeps the mix below the clip point,
    # so the noisy-minus-clean SNR estimate stays exact)
    noisy2 = np.asarray(
        batch_mix_noise_bank(
            x, valid, bank, 5.0, jax.random.PRNGKey(1), per_sample_type=True
        )
    )
    for i in range(2):
        assert abs(estimate_snr(x[i], noisy2[i]) - 5.0) < 0.8


def test_batch_noise_bank_matches_numpy_reference():
    """Sample-exact equivalence with the offline numpy injector
    (add_real_noise_np): given the segment the bank gather selects, the
    batched mix reproduces the reference power-scale + peak-normalize math
    (add_real_noise_to_audio.py:129-160). The type/offset draws are
    mirrored from the same key split the kernel uses."""
    import jax

    rng = np.random.default_rng(7)
    B, T = 3, 5000
    x = np.stack([_tone(T), _tone(T, f=250.0), _tone(T, f=300.0) * 3.0])
    x = x.astype(np.float32)  # 3rd row clips post-mix -> peak normalize path
    bank = rng.normal(size=(5, 8000)).astype(np.float32)
    valid = np.ones((B, T), bool)
    key = jax.random.PRNGKey(3)
    got = np.asarray(
        batch_mix_noise_bank(x, valid, bank, 10.0, key, per_sample_type=True)
    )
    # mirror the kernel's draw structure (k_type, k_off = split(key))
    k_type, k_off = jax.random.split(key)
    types = np.asarray(jax.random.randint(k_type, (B,), 0, bank.shape[0]))
    offsets = np.asarray(jax.random.randint(k_off, (B,), 0, bank.shape[1]))
    for i in range(B):
        seg = bank[types[i]][(np.arange(T) + offsets[i]) % bank.shape[1]]
        want = add_real_noise_np(x[i].astype(np.float64), seg.astype(np.float64), 10.0)
        np.testing.assert_allclose(got[i], want, atol=2e-6)


def test_format_fix(tmp_path):
    stereo = np.stack([_tone(32000, sr=32000), _tone(32000, sr=32000, f=100)], axis=1)
    p_in = str(tmp_path / "in.wav")
    p_out = str(tmp_path / "out.wav")
    write_wav(p_in, stereo, 32000)
    ok, sr, ch = check_audio_format(p_in)
    assert not ok and sr == 32000 and ch == 2
    fix_audio_format(p_in, p_out)
    ok, sr, ch = check_audio_format(p_out)
    assert ok and sr == 16000 and ch == 1


@pytest.mark.parametrize("mode", ["white", "real"])
def test_cli_end_to_end(tmp_path, mode):
    # build a tiny wav tree + manifest
    clean_root = tmp_path / "clean"
    out_root = tmp_path / "noisy"
    rels = ["spk/a.wav", "spk/b.wav"]
    os.makedirs(clean_root / "spk")
    for i, rel in enumerate(rels):
        write_wav(str(clean_root / rel), _tone(f=300 + 100 * i), 16000)
    manifest = tmp_path / "train.tsv"
    with open(manifest, "w") as f:
        print(str(clean_root), file=f)
        for rel in rels:
            print(f"{rel}\t16000", file=f)

    argv = [
        "inject",
        "--input_root", str(clean_root),
        "--output_root", str(out_root),
        "--snr_db", "10",
        "--manifest_path", str(manifest),
        "--verify",
    ]
    if mode == "real":
        noise_root = tmp_path / "5types"
        os.makedirs(noise_root)
        rng = np.random.default_rng(0)
        for fname in ["babble.wav", "f16.wav", "factory1.wav", "hfchannel.wav", "volvo.wav"]:
            write_wav(str(noise_root / fname), rng.normal(size=4000) * 0.1, 16000)
        argv += ["--noise_root", str(noise_root), "--noise_mode", "random"]
    rc = audio_cli_main(argv)
    assert rc == 0
    for rel in rels:
        assert (out_root / rel).exists()


def test_cli_type_specific_real_noise(tmp_path):
    rng = np.random.default_rng(1)
    clean_root = tmp_path / "clean"
    out_root = tmp_path / "root1-f16-15db"
    os.makedirs(clean_root)
    write_wav(str(clean_root / "a.wav"), _tone(8000, f=250), 16000)
    manifest = tmp_path / "train.tsv"
    with open(manifest, "w") as f:
        print(str(clean_root), file=f)
        print("a.wav\t8000", file=f)
    noise_root = tmp_path / "5types"
    os.makedirs(noise_root)
    for fname in ["babble.wav", "f16.wav", "factory1.wav", "hfchannel.wav", "volvo.wav"]:
        write_wav(str(noise_root / fname), rng.normal(size=3000) * 0.1, 16000)
    rc = audio_cli_main([
        "inject", "--input_root", str(clean_root), "--output_root", str(out_root),
        "--snr_db", "15", "--manifest_path", str(manifest),
        "--noise_root", str(noise_root), "--noise_mode", "type_specific",
        "--noise_type", "f16", "--verify",
    ])
    assert rc == 0
    clean, _ = read_wav(str(clean_root / "a.wav"))
    noisy, _ = read_wav(str(out_root / "a.wav"))
    assert abs(estimate_snr(clean, noisy) - 15.0) < 1.0


def test_cli_missing_noise_file_errors(tmp_path):
    clean_root = tmp_path / "c"
    os.makedirs(clean_root)
    write_wav(str(clean_root / "a.wav"), _tone(4000), 16000)
    manifest = tmp_path / "train.tsv"
    with open(manifest, "w") as f:
        print(str(clean_root), file=f)
        print("a.wav\t4000", file=f)
    empty_noise = tmp_path / "empty"
    os.makedirs(empty_noise)
    with pytest.raises(FileNotFoundError):
        audio_cli_main([
            "inject", "--input_root", str(clean_root), "--output_root",
            str(tmp_path / "o"), "--snr_db", "10",
            "--manifest_path", str(manifest), "--noise_root", str(empty_noise),
        ])


def test_verify_tolerates_peak_normalized_mixes(tmp_path):
    """A loud clip at low SNR gets peak-normalized by the mixer; the naive
    noisy-minus-clean estimate shifts by several dB, but the verify gate
    must pass via the scale-corrected estimator."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.noise import (
        add_white_noise_np,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.verify import (
        verify_noise_injection,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.wavio import (
        write_wav,
    )

    rng = np.random.default_rng(0)
    os.makedirs(tmp_path / "clean")
    os.makedirs(tmp_path / "noisy")
    rels = []
    for i in range(4):
        rel = f"loud{i}.wav"
        clean = _tone(amp=0.95, f=200.0 + 60 * i)  # peak near full scale
        noisy = add_white_noise_np(clean, 0.0, rng)  # 0 dB forces clipping
        assert np.max(np.abs(clean + (noisy * 0))) <= 1.0
        write_wav(str(tmp_path / "clean" / rel), clean, 16000)
        write_wav(str(tmp_path / "noisy" / rel), noisy, 16000)
        rels.append(rel)
    ok, results = verify_noise_injection(
        str(tmp_path / "clean"), str(tmp_path / "noisy"), rels, 0.0,
        tolerance_db=2.0,
    )
    assert ok, results


def _write_riff(path, fmt_tag, sampwidth, sr, payload, n_channels=1):
    """Minimal RIFF writer for formats stdlib wave can't produce."""
    import struct

    fmt = struct.pack(
        "<HHIIHH", fmt_tag, n_channels, sr,
        sr * n_channels * sampwidth, n_channels * sampwidth, sampwidth * 8,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks)


def test_read_float32_wav(tmp_path, rng):
    """IEEE-float WAVs (format tag 3) load via the RIFF fallback — stdlib
    wave rejects them at open ('unknown format: 3'), so the branch needs its
    own parser; the reference reads them fine through soundfile."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.wavio import (
        read_wav,
    )

    x = rng.normal(size=500).astype(np.float32) * 0.3
    p = str(tmp_path / "f32.wav")
    _write_riff(p, 3, 4, 16000, x.tobytes())
    audio, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(audio, x.astype(np.float64), rtol=1e-6)


def test_read_24bit_pcm_wav(tmp_path, rng):
    """24-bit PCM decodes with sign extension (soundfile parity)."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.wavio import (
        read_wav,
    )

    vals = np.array([0, 1, -1, 2**23 - 1, -(2**23), 12345, -54321], np.int32)
    raw = bytearray()
    for v in vals:
        raw += int(v & 0xFFFFFF).to_bytes(3, "little")
    p = str(tmp_path / "p24.wav")
    _write_riff(p, 1, 3, 16000, bytes(raw))
    audio, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(audio, vals / 2.0**23, rtol=0, atol=1e-12)


def test_verify_mono_mixes_stereo_clean(tmp_path, rng):
    """A stereo clean source verifies against the injector's mono-mixed
    noisy output (shape mismatch regression)."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.verify import (
        verify_noise_injection,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.noise import (
        add_white_noise_np,
    )

    os.makedirs(tmp_path / "clean")
    os.makedirs(tmp_path / "noisy")
    stereo = np.stack(
        [np.sin(np.arange(4000) / 10) * 0.4,
         np.sin(np.arange(4000) / 10 + 0.1) * 0.4], axis=1
    )
    write_wav(str(tmp_path / "clean" / "a.wav"), stereo, 16000)
    mono = stereo.mean(axis=1)
    noisy = add_white_noise_np(mono, 10.0, np.random.default_rng(0))
    write_wav(str(tmp_path / "noisy" / "a.wav"), noisy, 16000)
    ok, results = verify_noise_injection(
        str(tmp_path / "clean"), str(tmp_path / "noisy"), ["a.wav"], 10.0
    )
    assert ok and abs(results[0][1] - 10.0) < 2.0
