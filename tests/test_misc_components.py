import os

import jax
import jax.numpy as jnp
import numpy as np

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.features import (
    fbank_lengths,
    frame_signal,
    log_mel_spectrogram,
    mel_filterbank,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
    dad_preset,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.dad import (
    StepScalars,
    init_dad_train_state,
    make_dad_train_step,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.batching import (
    Batch,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.checkpointing import (
    restore_train_state,
    save_train_state,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.utils.profiling import (
    StepTimer,
    device_memory_stats,
)

CFG = dad_preset("iemocap", input_dim=16, hidden_dim=8, batch_size=8,
                 warmup_epochs=1, ecda_start_epoch=1, epochs=8,
                 weight_ramp_epochs=2)


def _batch(rng, labeled=True, B=8, T=6, D=16):
    labels = rng.integers(0, 4, B).astype(np.int32) if labeled else np.full(B, -1, np.int32)
    return Batch(
        rng.normal(size=(B, T, D)).astype(np.float32),
        np.zeros((B, T), bool), labels,
        np.arange(B, dtype=np.int32), np.ones(B, bool),
    )


def test_train_state_roundtrip(tmp_path, rng):
    head, tx, state = init_dad_train_state(CFG, jax.random.PRNGKey(0))
    step = make_dad_train_step(head, tx, CFG)
    clean, noisy = _batch(rng), _batch(rng, labeled=False)
    scalars = StepScalars.for_epoch(CFG, 3)
    state, _m, _t = step(state, clean, noisy, scalars, jnp.zeros(4), jax.random.PRNGKey(1))

    path = str(tmp_path / "ckpt" / "last_state.msgpack")
    save_train_state(path, state, metadata={"epoch": 3, "note": "x"})

    _h2, _tx2, fresh = init_dad_train_state(CFG, jax.random.PRNGKey(9))
    restored, meta = restore_train_state(path, fresh)
    assert meta["epoch"] == 3
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6),
        state,
        restored,
    )
    # restored state steps identically to the original
    s1, m1, _ = step(state, clean, noisy, scalars, jnp.zeros(4), jax.random.PRNGKey(2))
    s2, m2, _ = step(restored, clean, noisy, scalars, jnp.zeros(4), jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(m1["total_loss"]), float(m2["total_loss"]), rtol=1e-6)


def test_trainer_resume(tmp_path, monkeypatch, rng):
    monkeypatch.chdir(tmp_path)
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data import (
        load_feature_store,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train import (
        CrossDomainTrainer,
    )

    from helpers import make_iemocap_dir

    LM = {"ang": 0, "hap": 1, "neu": 2, "sad": 3}
    cd, *_ = make_iemocap_dir(tmp_path / "c", n=60, dim=12)
    nd, *_ = make_iemocap_dir(tmp_path / "n", n=60, dim=12, seed=1)
    cfg = dad_preset(
        "iemocap", input_dim=12, hidden_dim=8, batch_size=16, epochs=3,
        warmup_epochs=1, ecda_start_epoch=1, validation_interval=1,
        noisy_data_dir="x/root1-babble-10db", length_buckets=(32,),
    )
    t1 = CrossDomainTrainer(cfg, fold=0,
                            clean_store=load_feature_store(cd, LM),
                            noisy_store=load_feature_store(nd, LM))
    t1.train(checkpoint_interval=1)
    assert os.path.exists(t1._last_state_path)

    t2 = CrossDomainTrainer(cfg, fold=0,
                            clean_store=load_feature_store(cd, LM),
                            noisy_store=load_feature_store(nd, LM))
    start = t2.try_resume()
    assert start == 3  # saved at epoch 2 (0-based) -> resume at 3
    assert t2.best_noisy_weighted_acc == t1.best_noisy_weighted_acc


def test_fbank_shapes():
    wav = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16000)), jnp.float32)
    mel = log_mel_spectrogram(wav)
    F = 1 + (16000 - 400) // 160
    assert mel.shape == (2, F, 80)
    assert np.isfinite(np.asarray(mel)).all()
    assert int(fbank_lengths(jnp.asarray([16000]))[0]) == F
    frames = frame_signal(wav, 400, 160)
    np.testing.assert_allclose(np.asarray(frames)[0, 1], np.asarray(wav)[0, 160:560])
    fb = mel_filterbank()
    assert fb.shape == (201, 80)
    # every mel filter sums to something positive; every fft bin covered-ish
    assert (fb.sum(0) > 0).all()


def test_step_timer():
    t = StepTimer(skip_first=1)
    import time as _time

    for _ in range(3):
        with t:
            _time.sleep(0.01)
    assert t.summary(clips_per_step=10)["steps"] == 3
    assert t.mean_step_time() > 0.005
    device_memory_stats()  # smoke (may be empty on CPU)
