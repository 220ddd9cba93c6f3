"""Tests for the micro-batched prediction server (eval/serving.py)."""

import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
    dad_preset,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.eval.serving import (
    EmotionPredictor,
    PredictionServer,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.heads import (
    SSRLState,
    init_ssrl,
)

DIM = 16


@pytest.fixture(scope="module")
def predictor():
    cfg = dad_preset("iemocap", input_dim=DIM, hidden_dim=8)
    _head, ssrl = init_ssrl(jax.random.PRNGKey(0), input_dim=DIM, hidden_dim=8)
    p = EmotionPredictor(cfg, ssrl, batch_size=4, frame_buckets=(8, 32))
    p.warmup()
    return p


def _clip(t, seed=0):
    return np.random.default_rng(seed).normal(size=(t, DIM)).astype(np.float32)


def test_predict_features_shapes_and_order(predictor):
    clips = [_clip(5, 1), _clip(30, 2), _clip(12, 3)]
    outs = predictor.predict_features(clips)
    assert len(outs) == 3
    for out in outs:
        assert out["label"] in predictor.class_names
        assert abs(sum(out["probs"].values()) - 1.0) < 1e-4
    # order preserved: recompute clip 1 alone and compare
    alone = predictor.predict_features([clips[1]])[0]
    assert alone["label"] == outs[1]["label"]
    assert np.allclose(
        list(alone["probs"].values()), list(outs[1]["probs"].values()), atol=1e-5
    )


def test_bucketing_is_padding_invariant(predictor):
    # same clip must give the same probs regardless of which bucket its
    # batch lands in (masked pooling ignores pad frames)
    c = _clip(7, 9)
    small = predictor.predict_features([c])[0]
    mixed = predictor.predict_features([c, _clip(31, 10)])[0]
    assert np.allclose(
        list(small["probs"].values()), list(mixed["probs"].values()), atol=1e-5
    )


def test_teacher_toggle(predictor):
    cfg = predictor.cfg
    # make teacher differ from student
    student = predictor.ssrl.student
    teacher = jax.tree.map(lambda x: x + 0.3, student)
    p2 = EmotionPredictor(
        cfg, SSRLState(student=student, teacher=teacher),
        batch_size=4, frame_buckets=(8, 32), use_teacher=True,
    )
    c = _clip(6, 4)
    a = predictor.predict_features([c])[0]["probs"]
    b = p2.predict_features([c])[0]["probs"]
    assert not np.allclose(list(a.values()), list(b.values()))


def test_http_server_end_to_end(predictor):
    server = PredictionServer(predictor, port=0, max_wait_ms=2.0)
    server.start()
    try:
        base = f"http://{server.host}:{server.port}"
        # health
        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and not health["wav_input"]

        def post(payload):
            req = urllib.request.Request(
                base + "/predict",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                return r.getcode(), json.loads(r.read())

        # concurrent requests coalesce into one micro-batch
        results = [None] * 6
        def worker(i):
            results[i] = post({"features": _clip(10 + i, i).tolist()})

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for code, out in results:
            assert code == 200
            assert out["label"] in predictor.class_names

        # malformed request -> 400
        try:
            post({"nonsense": 1})
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # wav request without an encoder -> 500 with message
        try:
            post({"wav": [0.0] * 100})
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 500
            assert "checkpoint" in json.loads(e.read())["error"]

        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            health = json.loads(r.read())
        assert health["requests_served"] >= 6
    finally:
        server.shutdown()


@pytest.mark.slow
def test_wav_path_with_tiny_encoder():
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
        EncoderConfig,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.emotion2vec import (
        Emotion2vecEncoder,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.extract import (
        FeatureExtractor,
    )
    from test_d2v_pretrain import TINY_ENC

    enc_cfg = EncoderConfig(**TINY_ENC)
    enc = Emotion2vecEncoder(enc_cfg)
    wav = np.zeros((1, 2000), np.float32)
    params = enc.init(jax.random.PRNGKey(0), wav, np.ones((1, 2000), bool))
    extractor = FeatureExtractor(enc_cfg, params, batch_size=2,
                                 buckets=(2000, 4000))
    cfg = dad_preset("iemocap", input_dim=enc_cfg.embed_dim, hidden_dim=8)
    _h, ssrl = init_ssrl(jax.random.PRNGKey(1),
                         input_dim=enc_cfg.embed_dim, hidden_dim=8)
    p = EmotionPredictor(cfg, ssrl, extractor=extractor, batch_size=2,
                         frame_buckets=(8, 64))
    rng = np.random.default_rng(0)
    outs = p.predict_wavs([rng.normal(size=1800) * 0.1,
                           rng.normal(size=3500) * 0.1])
    assert len(outs) == 2 and all(o["label"] in p.class_names for o in outs)

    # int16 transfer path: same clips quantized to PCM agree with the f32
    # path (1/32768 input quantization, loose tolerance on probs)
    p16 = EmotionPredictor(cfg, ssrl, extractor=extractor, batch_size=2,
                           frame_buckets=(8, 64),
                           wav_transfer_dtype="int16")
    clip = np.random.default_rng(0).normal(size=1800).astype(np.float32) * 0.1
    out16 = p16.predict_wavs([clip])[0]
    f32 = p.predict_wavs([clip])[0]
    assert np.allclose(
        list(out16["probs"].values()), list(f32["probs"].values()),
        atol=5e-3,
    )
    # native int16 PCM input is accepted by BOTH transfer modes
    pcm = (np.random.default_rng(5).normal(size=1700) * 3000).astype(np.int16)
    for pred in (p, p16):
        out = pred.predict_wavs([pcm])[0]
        assert out["label"] in pred.class_names


def test_http_pcm16_payload():
    import base64

    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
        EncoderConfig,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.emotion2vec import (
        Emotion2vecEncoder,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.extract import (
        FeatureExtractor,
    )
    from test_d2v_pretrain import TINY_ENC

    enc_cfg = EncoderConfig(**TINY_ENC)
    enc = Emotion2vecEncoder(enc_cfg)
    params = enc.init(jax.random.PRNGKey(0), np.zeros((1, 2000), np.float32),
                      np.ones((1, 2000), bool))
    extractor = FeatureExtractor(enc_cfg, params, batch_size=2,
                                 buckets=(2000, 4000))
    cfg = dad_preset("iemocap", input_dim=enc_cfg.embed_dim, hidden_dim=8)
    _h, ssrl = init_ssrl(jax.random.PRNGKey(1),
                         input_dim=enc_cfg.embed_dim, hidden_dim=8)
    p = EmotionPredictor(cfg, ssrl, extractor=extractor, batch_size=2,
                         frame_buckets=(8, 64), wav_transfer_dtype="int16")
    server = PredictionServer(p, port=0, max_wait_ms=2.0)
    server.start()
    try:
        base = f"http://{server.host}:{server.port}"
        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            health = json.loads(r.read())
        assert health["pcm16_input"] and health["wav_transfer_dtype"] == "int16"

        pcm = (np.random.default_rng(0).normal(size=1800) * 3000).astype("<i2")
        body = {"pcm16": base64.b64encode(pcm.tobytes()).decode(), "sr": 16000}
        req = urllib.request.Request(
            base + "/predict", data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert out["label"] in p.class_names

        # bad base64 / odd byte count -> 400
        for bad in ("!!!not-base64!!!", base64.b64encode(b"abc").decode()):
            try:
                req = urllib.request.Request(
                    base + "/predict",
                    data=json.dumps({"pcm16": bad}).encode(),
                )
                urllib.request.urlopen(req, timeout=30)
                raise AssertionError("expected 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        server.shutdown()


def test_long_clip_not_truncated(predictor):
    # clips past the top frame bucket round UP (extract._bucket semantics):
    # all frames participate in the pooled prediction
    long_clip = _clip(40, 11)  # top bucket in the fixture is 32
    direct = predictor.predict_features([long_clip])[0]
    # truncating to the top bucket would give a different pooled result
    truncated = predictor.predict_features([long_clip[:32]])[0]
    assert not np.allclose(
        list(direct["probs"].values()), list(truncated["probs"].values())
    )


def test_http_bad_shapes_rejected_without_poisoning(predictor):
    import urllib.error
    import urllib.request

    server = PredictionServer(predictor, port=0, max_wait_ms=2.0)
    server.start()
    try:
        base = f"http://{server.host}:{server.port}"

        def post(payload):
            req = urllib.request.Request(
                base + "/predict", data=json.dumps(payload).encode()
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                return r.getcode(), json.loads(r.read())

        for bad in (
            {"features": [1.0, 2.0, 3.0]},        # 1-D
            {"features": [[1.0, 2.0]]},            # wrong dim
            {"features": []},                      # empty
            {"wav": [[0.1, 0.2]]},                 # 2-D wav
            123,                                   # non-object body
        ):
            try:
                post(bad)
                raise AssertionError(f"expected 400 for {bad!r}")
            except urllib.error.HTTPError as e:
                assert e.code == 400
        # a valid request still works after the rejects
        code, out = post({"features": _clip(9, 5).tolist()})
        assert code == 200 and out["label"] in predictor.class_names
    finally:
        server.shutdown()


def test_http_concurrency_stress(predictor):
    # 32 concurrent clients x 3 requests each: all succeed, order preserved
    # per client, and the dispatcher coalesces into far fewer batches
    server = PredictionServer(predictor, port=0, max_wait_ms=3.0)
    server.start()
    before = predictor.batches_run
    try:
        base = f"http://{server.host}:{server.port}"
        errors = []

        def client(cid):
            try:
                for r in range(3):
                    req = urllib.request.Request(
                        base + "/predict",
                        data=json.dumps(
                            {"features": _clip(6 + (cid + r) % 20, cid).tolist()}
                        ).encode(),
                    )
                    with urllib.request.urlopen(req, timeout=60) as resp:
                        out = json.loads(resp.read())
                    assert out["label"] in predictor.class_names
            except Exception as e:  # noqa: BLE001
                errors.append((cid, e))

        threads = [threading.Thread(target=client, args=(i,)) for i in range(32)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors[:3]
        ran = predictor.batches_run - before
        assert ran < 96  # coalescing happened (96 = no batching at all)
    finally:
        server.shutdown()


def test_warmup_compiles_every_extractor_bucket(predictor, monkeypatch):
    """warmup() must touch EVERY wav bucket — a bucket skipped at warmup
    would compile on the single dispatcher thread at first use — and the
    server's ingress frame cap must not admit frames past the top warmed
    head bucket."""
    calls = []
    monkeypatch.setattr(
        EmotionPredictor, "predict_wavs",
        lambda self, wavs: calls.append(len(wavs[0])) or [],
    )
    p = EmotionPredictor(
        predictor.cfg, predictor.ssrl, batch_size=4, frame_buckets=(8, 32),
    )
    p.extractor = type("E", (), {"buckets": (2000, 4000, 8000)})()
    p.warmup()
    assert calls == [2000, 4000, 8000]

    server = PredictionServer(predictor, port=0)
    assert server.max_feature_frames == max(predictor.frame_buckets)
    server.shutdown()  # never started serve loop: must not deadlock
