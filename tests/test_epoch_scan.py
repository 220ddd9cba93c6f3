import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
    dad_preset,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.dad import (
    StepScalars,
    init_dad_train_state,
    make_dad_train_step,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.dad.epoch_scan import (
    make_dad_epoch_runner,
    stack_batches,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.batching import (
    Batch,
)

CFG = dad_preset("iemocap", input_dim=16, hidden_dim=8, batch_size=8,
                 warmup_epochs=1, ecda_start_epoch=1, epochs=8,
                 weight_ramp_epochs=2)


def _batch(rng, labeled=True, B=8, T=None, D=16):
    T = T or int(rng.integers(4, 9))
    feats = rng.normal(size=(B, T, D)).astype(np.float32)
    pm = np.zeros((B, T), bool)
    pm[:, T - 1:] = True
    labels = rng.integers(0, 4, B).astype(np.int32) if labeled else np.full(B, -1, np.int32)
    return Batch(feats, pm, labels, np.arange(B, dtype=np.int32), np.ones(B, bool))


def test_scan_epoch_matches_per_batch_stepping(rng):
    S = 4
    cleans = [_batch(rng) for _ in range(S)]
    noisies = [_batch(rng, labeled=False) for _ in range(S)]
    scalars = StepScalars.for_epoch(CFG, 4)
    anchors = jnp.zeros(4)
    key = jax.random.PRNGKey(7)
    keys = jax.random.split(key, S)

    # per-batch stepping (pad to a common T first so RNG shapes line up with
    # the scan variant)
    t_pad = max(b.feats.shape[1] for b in cleans + noisies)
    clean_stacked = stack_batches(cleans, t_pad)
    noisy_stacked = stack_batches(noisies, t_pad)

    head, tx, state = init_dad_train_state(CFG, jax.random.PRNGKey(0))
    step = make_dad_train_step(head, tx, CFG)
    s_loop = state
    loop_metrics = []
    for i in range(S):
        cb = Batch(*(np.asarray(x[i]) for x in clean_stacked))
        nb = Batch(*(np.asarray(x[i]) for x in noisy_stacked))
        s_loop, m, _t = step(s_loop, cb, nb, scalars, anchors, keys[i])
        loop_metrics.append(float(m["total_loss"]))

    _h, _tx, state2 = init_dad_train_state(CFG, jax.random.PRNGKey(0))
    runner = make_dad_epoch_runner(head, tx, CFG)
    s_scan, mean_metrics, tracking = runner(
        state2, clean_stacked, noisy_stacked, scalars, anchors, key
    )

    np.testing.assert_allclose(
        float(mean_metrics["total_loss"]), np.mean(loop_metrics), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(s_loop.ssrl.student["params"]["encoder"]["pre_net"]["kernel"]),
        np.asarray(s_scan.ssrl.student["params"]["encoder"]["pre_net"]["kernel"]),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(s_loop.dacp.ema_thresholds),
        np.asarray(s_scan.dacp.ema_thresholds),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(s_loop.dacp.score_sums),
        np.asarray(s_scan.dacp.score_sums),
        rtol=1e-4,
    )
    assert tracking["pseudo_label"].shape == (S, 8)


@pytest.mark.slow
def test_trainer_scan_mode_matches_loop_mode(tmp_path, monkeypatch, rng):
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

    def run(scan_chunk, tag):
        t = CrossDomainTrainer(
            cfg, fold=0, experiment_name=tag,
            clean_store=load_feature_store(cd, LM),
            noisy_store=load_feature_store(nd, LM),
            scan_chunk=scan_chunk,
        )
        t.train(checkpoint_interval=0)
        return t

    t_loop = run(0, "loop")
    t_scan = run(2, "scan")
    # NB: the two modes consume the augmentation RNG differently (one key per
    # batch vs per chunk), so trajectories are statistically — not bitwise —
    # equivalent; bitwise equivalence under identical keys is covered by
    # test_scan_epoch_matches_per_batch_stepping above.
    np.testing.assert_allclose(
        t_loop.best_noisy_weighted_acc, t_scan.best_noisy_weighted_acc, atol=5.0
    )
    np.testing.assert_allclose(
        np.asarray(t_loop.state.dacp.ema_thresholds),
        np.asarray(t_scan.state.dacp.ema_thresholds),
        rtol=0.1,
    )
    np.testing.assert_allclose(
        t_loop.training_history["total_loss"],
        t_scan.training_history["total_loss"],
        rtol=0.15,
    )
    assert len(t_scan.training_history["dacp_ema_thresholds"]) == 2


# ---------------------------------------------------------------------------
# device-resident feature corpus (parallel/resident.py, round 4)


def _resident_pair_setup(tmp_path):
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data import (
        load_feature_store,
    )
    from helpers import make_iemocap_dir

    LM = {"ang": 0, "hap": 1, "neu": 2, "sad": 3}
    cd, *_ = make_iemocap_dir(tmp_path / "c", n=60, dim=12)
    nd, *_ = make_iemocap_dir(tmp_path / "n", n=60, dim=12, seed=1)
    cfg = dad_preset(
        "iemocap", input_dim=12, hidden_dim=8, batch_size=16, epochs=3,
        warmup_epochs=1, ecda_start_epoch=1, validation_interval=1,
        noisy_data_dir="x/root1-babble-10db", length_buckets=(8, 16, 32),
        num_tracked_samples=8,  # < fold train size so the bias log engages
    )
    return cfg, load_feature_store(cd, LM), load_feature_store(nd, LM)


@pytest.mark.slow
def test_trainer_resident_matches_streaming(tmp_path, monkeypatch):
    """Feature-mode resident path == per-batch streaming, value for value:
    the gather step uses each batch's own bucket shape and the same per-step
    key stream, so losses, params, DACP state, and the bias log all match."""
    monkeypatch.chdir(tmp_path)
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train import (
        CrossDomainTrainer,
    )

    cfg, clean, noisy = _resident_pair_setup(tmp_path)

    def build(resident, tag):
        return CrossDomainTrainer(
            cfg, fold=0, experiment_name=tag, clean_store=clean,
            noisy_store=noisy, prefetch_depth=0, resident=resident,
        )

    stream = build(False, "stream")
    res = build(True, "res")
    assert stream._resident is None and res._resident is not None

    for epoch in (0, 1):  # warmup + post-warmup (DACP/ECDA/EMA/tracking)
        a = stream.train_epoch(epoch)
        b = res.train_epoch(epoch)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-6, atol=1e-7,
                                       err_msg=f"epoch {epoch} {k}")

    for pa, pb in zip(jax.tree.leaves(stream.state.ssrl.student),
                      jax.tree.leaves(res.state.ssrl.student)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-6, atol=1e-7)
    for da, db in zip(jax.tree.leaves(stream.state.dacp),
                      jax.tree.leaves(res.state.dacp)):
        np.testing.assert_allclose(np.asarray(da), np.asarray(db),
                                   rtol=1e-6, atol=1e-7)
    assert stream.bias_analysis_log == res.bias_analysis_log
    assert len(res.bias_analysis_log) > 0


@pytest.mark.slow
def test_trainer_resident_scanned_matches_streamed_scan(tmp_path, monkeypatch):
    """Resident + scan_chunk == the streamed scan_chunk path: same
    chunk-common padding and per-chunk key split; only upload-vs-gather
    differs."""
    monkeypatch.chdir(tmp_path)
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train import (
        CrossDomainTrainer,
    )

    cfg, clean, noisy = _resident_pair_setup(tmp_path)

    def build(resident, tag):
        return CrossDomainTrainer(
            cfg, fold=0, experiment_name=tag, clean_store=clean,
            noisy_store=noisy, prefetch_depth=0, scan_chunk=2,
            resident=resident,
        )

    stream = build(False, "sc_stream")
    res = build(True, "sc_res")
    assert res._resident is not None and res._resident_runner is not None

    for epoch in (0, 1):
        a = stream.train_epoch(epoch)
        b = res.train_epoch(epoch)
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-6,
                                       err_msg=f"epoch {epoch} {k}")
    for pa, pb in zip(jax.tree.leaves(stream.state.ssrl.student),
                      jax.tree.leaves(res.state.ssrl.student)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-5, atol=1e-6)
    assert stream.bias_analysis_log == res.bias_analysis_log


def test_trainer_resident_guards(tmp_path, monkeypatch):
    """'auto' over budget falls back to streaming; resident=True with a
    mesh raises."""
    monkeypatch.chdir(tmp_path)
    import pytest as _pytest

    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train import (
        CrossDomainTrainer,
    )

    cfg, clean, noisy = _resident_pair_setup(tmp_path)
    t = CrossDomainTrainer(
        cfg, fold=0, experiment_name="auto_budget", clean_store=clean,
        noisy_store=noisy, prefetch_depth=0, resident="auto",
        resident_max_bytes=16,
    )
    assert t._resident is None
    avg = t.train_epoch(0)
    assert np.isfinite(avg["total_loss"])

    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.parallel import (
        make_mesh,
    )

    mesh = make_mesh(8, tp=1, axis_names=("dp",))
    with _pytest.raises(ValueError, match="resident"):
        CrossDomainTrainer(
            cfg, fold=0, experiment_name="mesh_res", clean_store=clean,
            noisy_store=noisy, mesh=mesh, resident=True,
        )
