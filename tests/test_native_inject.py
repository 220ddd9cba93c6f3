"""Tests for the native (C++) offline noise injector (native/inject.cc).

The numpy engine is the reference-exact path; the native engine must be
SNR-exact, deterministic, and numerically equivalent to numpy for real-noise
mode (which has no RNG in the mix itself)."""

import os

import numpy as np
import pytest

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.cli import (
    main as audio_cli_main,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.native_inject import (
    inject_files_native,
    native_inject_available,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.wavio import (
    read_wav,
    write_wav,
)

pytestmark = pytest.mark.skipif(
    not native_inject_available(), reason="native injector .so unavailable"
)


def _tone(n=16000, sr=16000, f=440.0, amp=0.3):
    t = np.arange(n) / sr
    return amp * np.sin(2 * np.pi * f * t)


def _measured_snr(clean, noisy):
    n = min(len(clean), len(noisy))
    noise = noisy[:n] - clean[:n]
    return 10 * np.log10(np.mean(clean[:n] ** 2) / np.mean(noise**2))


def _make_tree(root, n_files=6):
    rels, ins = [], []
    os.makedirs(os.path.join(root, "spk"), exist_ok=True)
    for i in range(n_files):
        rel = f"spk/clip{i}.wav"
        p = os.path.join(root, rel)
        write_wav(p, _tone(n=16000 + 777 * i, f=220.0 * (1 + i % 4)), 16000)
        rels.append(rel)
        ins.append(p)
    return rels, ins


def test_white_noise_snr_and_determinism(tmp_path):
    _, ins = _make_tree(str(tmp_path / "clean"))
    outs1 = [p.replace("clean", "noisy1") for p in ins]
    outs2 = [p.replace("clean", "noisy2") for p in ins]
    seeds = np.arange(len(ins), dtype=np.uint64) + 123

    st = inject_files_native(ins, outs1, 10.0, seeds=seeds)
    assert not st.any()
    st = inject_files_native(ins, outs2, 10.0, seeds=seeds)
    assert not st.any()

    for pin, p1, p2 in zip(ins, outs1, outs2):
        clean, sr = read_wav(pin)
        noisy, sr2 = read_wav(p1)
        assert sr2 == sr
        # 16-bit quantization perturbs the measured SNR slightly
        assert abs(_measured_snr(clean, noisy) - 10.0) < 0.5
        # same seeds -> bit-identical outputs
        with open(p1, "rb") as a, open(p2, "rb") as b:
            assert a.read() == b.read()


def test_distinct_seeds_give_distinct_noise(tmp_path):
    _, ins = _make_tree(str(tmp_path / "clean"), n_files=2)
    outs = [p.replace("clean", "noisy") for p in ins]
    inject_files_native(ins, outs, 10.0, seeds=np.array([1, 2], dtype=np.uint64))
    a, _ = read_wav(outs[0])
    b, _ = read_wav(outs[1])
    n = min(len(a), len(b))
    assert not np.allclose(a[:n], b[:n])


def test_real_noise_matches_numpy_engine(tmp_path):
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.noise import (
        add_real_noise_np,
        tile_noise_np,
    )

    _, ins = _make_tree(str(tmp_path / "clean"))
    outs = [p.replace("clean", "noisy") for p in ins]
    rng = np.random.default_rng(0)
    bank = {
        "babble": rng.normal(size=5000).astype(np.float64) * 0.1,
        "volvo": rng.normal(size=3000).astype(np.float64) * 0.05,
    }
    types = ["babble", "volvo"] * 3
    st = inject_files_native(
        ins, outs, 5.0,
        noise_bank={k: v.astype(np.float32) for k, v in bank.items()},
        noise_type_per_file=types,
    )
    assert not st.any()
    for pin, pout, ntype in zip(ins, outs, types):
        clean, _ = read_wav(pin)
        got, _ = read_wav(pout)
        noise = tile_noise_np(bank[ntype].astype(np.float32).astype(np.float64),
                              len(clean))
        want = add_real_noise_np(clean, noise, 5.0)
        # both engines quantize to int16; bank is float32 in both
        assert np.max(np.abs(got - want)) <= 2.0 / 32767.0


def test_multichannel_downmix(tmp_path):
    p_in = str(tmp_path / "stereo.wav")
    p_out = str(tmp_path / "noisy.wav")
    left = _tone(f=300.0)
    right = _tone(f=500.0)
    write_wav(p_in, np.stack([left, right], axis=1), 16000)
    st = inject_files_native([p_in], [p_out], 20.0,
                             seeds=np.array([7], dtype=np.uint64))
    assert not st.any()
    noisy, _ = read_wav(p_out)
    assert noisy.ndim == 1
    mono = (left + right) / 2
    assert abs(_measured_snr(mono, noisy) - 20.0) < 0.5


def test_read_failure_status(tmp_path):
    bad = str(tmp_path / "not_a_wav.wav")
    with open(bad, "wb") as f:
        f.write(b"garbage")
    ok_rel, ok_ins = _make_tree(str(tmp_path / "clean"), n_files=1)
    ins = [bad, ok_ins[0]]
    outs = [str(tmp_path / "o1.wav"), str(tmp_path / "o2.wav")]
    st = inject_files_native(ins, outs, 10.0)
    assert st[0] == 1 and st[1] == 0
    assert os.path.exists(outs[1]) and not os.path.exists(outs[0])


def test_cli_native_engine_end_to_end(tmp_path):
    clean_root = tmp_path / "clean"
    rels, _ = _make_tree(str(clean_root))
    manifest = tmp_path / "train.tsv"
    with open(manifest, "w") as f:
        print(str(clean_root), file=f)
        for rel in rels:
            print(f"{rel}\t16000", file=f)
    rc = audio_cli_main([
        "inject",
        "--input_root", str(clean_root),
        "--output_root", str(tmp_path / "noisy"),
        "--snr_db", "10",
        "--manifest_path", str(manifest),
        "--engine", "native",
        "--verify",
    ])
    assert rc == 0
    for rel in rels:
        assert (tmp_path / "noisy" / rel).exists()


def test_cli_native_falls_back_for_unreadable_files(tmp_path):
    # a float32 wav exercises the Python fallback only if the native reader
    # rejects it; our native reader handles float32, so instead corrupt one
    # file to a non-RIFF payload and confirm the numpy engine cannot save it
    # either way -- the CLI must surface the count but keep going natively.
    clean_root = tmp_path / "clean"
    rels, ins = _make_tree(str(clean_root), n_files=3)
    # make one file IEEE-float32 (handled natively -> still written)
    import struct
    import wave

    fpath = ins[1]
    data = _tone().astype(np.float32)
    with wave.open(fpath, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(4)
        w.setframerate(16000)
        w.writeframes(data.tobytes())
    # patch fmt tag to IEEE float (wave writes PCM tag 1)
    with open(fpath, "r+b") as f:
        hdr = f.read(64)
        i = hdr.find(b"fmt ")
        f.seek(i + 8)
        f.write(struct.pack("<H", 3))
    manifest = tmp_path / "train.tsv"
    with open(manifest, "w") as f:
        print(str(clean_root), file=f)
        for rel in rels:
            print(f"{rel}\t16000", file=f)
    rc = audio_cli_main([
        "inject",
        "--input_root", str(clean_root),
        "--output_root", str(tmp_path / "noisy"),
        "--snr_db", "10",
        "--manifest_path", str(manifest),
        "--engine", "native",
    ])
    assert rc == 0
    for rel in rels:
        assert (tmp_path / "noisy" / rel).exists()


def test_empty_noise_bank_entry_marks_failure(tmp_path):
    # a zero-length bank entry must come back as status, not SIGFPE
    _, ins = _make_tree(str(tmp_path / "clean"), n_files=1)
    outs = [str(tmp_path / "o.wav")]
    st = inject_files_native(
        ins, outs, 10.0,
        noise_bank={"babble": np.zeros(0, np.float32)},
        noise_type_per_file=["babble"],
    )
    assert st[0] == 1


def test_corrupt_fmt_chunk_is_read_error(tmp_path):
    # valid RIFF/WAVE header with an 8-byte fmt chunk: parser must reject,
    # not over-read
    bad = str(tmp_path / "bad.wav")
    import struct
    with open(bad, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36) + b"WAVE")
        f.write(b"fmt " + struct.pack("<I", 8) + b"\x01\x00\x01\x00\x80>\x00\x00")
        f.write(b"data" + struct.pack("<I", 0))
    st = inject_files_native([bad], [str(tmp_path / "o.wav")], 10.0)
    assert st[0] == 1


def test_fallback_survives_totally_corrupt_file(tmp_path):
    # native rejects AND the Python wave module rejects: the CLI must log
    # and continue, not crash the grid run
    clean_root = tmp_path / "clean"
    rels, ins = _make_tree(str(clean_root), n_files=2)
    with open(ins[0], "wb") as f:
        f.write(b"RIFFgarbagegarbage")
    manifest = tmp_path / "train.tsv"
    with open(manifest, "w") as f:
        print(str(clean_root), file=f)
        for rel in rels:
            print(f"{rel}\t16000", file=f)
    rc = audio_cli_main([
        "inject",
        "--input_root", str(clean_root),
        "--output_root", str(tmp_path / "noisy"),
        "--snr_db", "10",
        "--manifest_path", str(manifest),
        "--engine", "native",
        "--verify",
    ])
    assert rc == 0  # verify runs over the files that succeeded
    assert (tmp_path / "noisy" / rels[1]).exists()
    assert not (tmp_path / "noisy" / rels[0]).exists()


def test_fuzzed_wav_headers_never_crash(tmp_path):
    # random mutations of a valid header must produce status codes, not
    # crashes (bounds-checked chunk parsing in native/inject.cc)
    rng = np.random.default_rng(0)
    _, ins = _make_tree(str(tmp_path / "clean"), n_files=1)
    with open(ins[0], "rb") as f:
        good = bytearray(f.read())
    ins_f, outs_f = [], []
    for i in range(40):
        buf = bytearray(good)
        n_mut = int(rng.integers(1, 6))
        for _ in range(n_mut):
            pos = int(rng.integers(0, min(len(buf), 200)))
            buf[pos] = int(rng.integers(0, 256))
        p = str(tmp_path / f"fuzz{i}.wav")
        with open(p, "wb") as f:
            f.write(bytes(buf))
        ins_f.append(p)
        outs_f.append(str(tmp_path / f"out{i}.wav"))
    st = inject_files_native(ins_f, outs_f, 10.0)
    # every file either processed or cleanly failed; the process survived
    assert set(np.unique(st)).issubset({0, 1, 2})
