import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
    EncoderConfig,
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
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.parallel import (
    FusedConfig,
    init_fused,
    make_fused_extract_train_step,
    make_mesh,
    make_sharded_dad_train_step,
    shard_dad_state,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.parallel.fused import (
    FusedBatch,
    place_fused,
)

CFG = dad_preset("iemocap", input_dim=16, hidden_dim=8, batch_size=16,
                 warmup_epochs=1, ecda_start_epoch=1, epochs=8,
                 weight_ramp_epochs=2)

TINY_ENC = EncoderConfig(
    embed_dim=16, depth=2, num_heads=2, prenet_depth=1,
    conv_feature_layers=((8, 4, 2), (8, 3, 2)),
    conv_pos_width=6, conv_pos_groups=2, conv_pos_depth=2,
    dtype="float32", use_flash_attention=False,
)


def _batch(rng, B=16, T=6, D=16, labeled=True):
    feats = rng.normal(size=(B, T, D)).astype(np.float32)
    pm = np.zeros((B, T), bool)
    labels = rng.integers(0, 4, B).astype(np.int32) if labeled else np.full(B, -1, np.int32)
    return Batch(feats, pm, labels, np.arange(B, dtype=np.int32), np.ones(B, bool))


def test_mesh_shapes():
    mesh = make_mesh(8, tp=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("dp", "tp")


def test_sharded_dad_step_matches_single_device(rng):
    head, tx, state = init_dad_train_state(CFG, jax.random.PRNGKey(0))
    clean, noisy = _batch(rng), _batch(rng, labeled=False)
    scalars = StepScalars.for_epoch(CFG, 4)
    anchors = jnp.zeros(4)
    key = jax.random.PRNGKey(7)

    base = make_dad_train_step(head, tx, CFG)
    s1, m1, _ = base(state, clean, noisy, scalars, anchors, key)

    mesh = make_mesh(8, tp=1, axis_names=("dp",))
    _h, _tx, state2 = init_dad_train_state(CFG, jax.random.PRNGKey(0))
    state2 = shard_dad_state(state2, mesh)
    sharded = make_sharded_dad_train_step(head, tx, CFG, mesh)
    s2, m2, _ = sharded(state2, clean, noisy, scalars, anchors, key)

    np.testing.assert_allclose(
        float(m1["total_loss"]), float(m2["total_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s1.ssrl.student["params"]["encoder"]["pre_net"]["kernel"]),
        np.asarray(s2.ssrl.student["params"]["encoder"]["pre_net"]["kernel"]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(s1.dacp.ema_thresholds), np.asarray(s2.dacp.ema_thresholds),
        rtol=1e-5,
    )


def _fused_batch(rng, B=8, T=256, labeled=True):
    wav = rng.normal(size=(B, T)).astype(np.float32) * 0.1
    mask = np.zeros((B, T), bool)
    mask[0, T // 2:] = True
    labels = rng.integers(0, 4, B).astype(np.int32) if labeled else np.full(B, -1, np.int32)
    return FusedBatch(
        wav=jnp.asarray(wav),
        wav_mask=jnp.asarray(mask),
        labels=jnp.asarray(labels),
        row_valid=jnp.ones(B, bool),
    )


@pytest.mark.slow
def test_fused_extract_train_multichip(rng):
    cfg = FusedConfig(encoder=TINY_ENC, dad=CFG, inject_snr_db=10.0)
    encoder, enc_params, head, tx, state = init_fused(
        cfg, jax.random.PRNGKey(0), example_len=256
    )
    mesh = make_mesh(8, tp=2)
    step = make_fused_extract_train_step(encoder, head, tx, cfg, mesh)
    with mesh:
        enc_s, state_s = place_fused(enc_params, state, mesh)
        clean, noisy = _fused_batch(rng), _fused_batch(rng, labeled=False)
        scalars = StepScalars.for_epoch(CFG, 4)
        state2, metrics = step(
            enc_s, state_s, clean, noisy, scalars, jnp.zeros(4), jax.random.PRNGKey(1)
        )
        assert np.isfinite(float(metrics["total_loss"]))
        # run a second step to confirm state threading works
        state3, metrics2 = step(
            enc_s, state2, clean, noisy, scalars, jnp.zeros(4), jax.random.PRNGKey(2)
        )
        assert np.isfinite(float(metrics2["total_loss"]))


@pytest.mark.slow
def test_fused_matches_unsharded(rng):
    cfg = FusedConfig(encoder=TINY_ENC, dad=CFG)
    encoder, enc_params, head, tx, state = init_fused(
        cfg, jax.random.PRNGKey(0), example_len=256
    )
    clean, noisy = _fused_batch(rng), _fused_batch(rng, labeled=False)
    scalars = StepScalars.for_epoch(CFG, 4)

    single = make_fused_extract_train_step(encoder, head, tx, cfg, mesh=None)
    _s1, m1 = single(enc_params, state, clean, noisy, scalars, jnp.zeros(4),
                     jax.random.PRNGKey(1))

    mesh = make_mesh(8, tp=2)
    _e2, _p2, _h2, tx2, state2 = init_fused(cfg, jax.random.PRNGKey(0), example_len=256)
    sharded = make_fused_extract_train_step(encoder, head, tx2, cfg, mesh)
    with mesh:
        enc_s, state_s = place_fused(enc_params, state2, mesh)
        _s2, m2 = sharded(enc_s, state_s, clean, noisy, scalars, jnp.zeros(4),
                          jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(m1["total_loss"]), float(m2["total_loss"]), rtol=2e-4
    )


def test_fused_multi_snr_branch(rng):
    cfg = FusedConfig(encoder=TINY_ENC, dad=CFG, inject_snr_choices=(0.0, 10.0, 20.0))
    encoder, enc_params, head, tx, state = init_fused(
        cfg, jax.random.PRNGKey(0), example_len=256
    )
    step = make_fused_extract_train_step(encoder, head, tx, cfg, mesh=None)
    clean, noisy = _fused_batch(rng), _fused_batch(rng, labeled=False)
    scalars = StepScalars.for_epoch(CFG, 4)
    state2, metrics = step(enc_params, state, clean, noisy, scalars,
                           jnp.zeros(4), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))


@pytest.mark.slow
def test_fused_noise_bank_injection(rng):
    """NOISEX-bank injection inside the fused step: root1/root2 modes run,
    are live (differ from white noise), and the mesh path takes the bank
    as a replicated trailing argument."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.noise import (
        batch_mix_noise_bank,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.parallel.fused import (
        inject_noise,
    )

    bank = jnp.asarray(rng.normal(size=(5, 300)).astype(np.float32))
    clean, noisy = _fused_batch(rng), _fused_batch(rng, labeled=False)
    scalars = StepScalars.for_epoch(CFG, 4)
    key = jax.random.PRNGKey(1)

    # the injection the step applies, per mode, on the same wav batch
    wav, mask = noisy.wav, noisy.wav_mask
    cfg_w = FusedConfig(encoder=TINY_ENC, dad=CFG, inject_snr_db=10.0)
    cfg_r1 = FusedConfig(encoder=TINY_ENC, dad=CFG, inject_snr_db=10.0,
                         inject_noise_bank_mode="fixed", inject_noise_type=2)
    cfg_r2 = FusedConfig(encoder=TINY_ENC, dad=CFG,
                         inject_snr_choices=(0.0, 10.0),
                         inject_noise_bank_mode="random")
    out_w = np.asarray(inject_noise(cfg_w, wav, mask, key))
    out_r1 = np.asarray(inject_noise(cfg_r1, wav, mask, key, bank))
    out_r2 = np.asarray(inject_noise(cfg_r2, wav, mask, key, bank))
    assert not np.allclose(out_w, out_r1) and not np.allclose(out_r1, out_r2)
    # root1 routes through batch_mix_noise_bank with the fixed type
    want_r1 = np.asarray(
        batch_mix_noise_bank(wav, ~mask, bank, 10.0, key, noise_type=2)
    )
    np.testing.assert_array_equal(out_r1, want_r1)

    # the full fused step runs in bank mode (single device)
    cfg = cfg_r1
    encoder, enc_params, head, tx, state = init_fused(
        cfg, jax.random.PRNGKey(0), example_len=256
    )
    step = make_fused_extract_train_step(encoder, head, tx, cfg, mesh=None)
    _s, m1 = step(enc_params, state, clean, noisy, scalars, jnp.zeros(4),
                  jax.random.PRNGKey(1), bank)
    assert np.isfinite(float(m1["total_loss"]))

    # mesh path: bank rides replicated; loss matches the single-device run
    encoder, enc_params, head, tx, state = init_fused(
        cfg, jax.random.PRNGKey(0), example_len=256
    )
    mesh = make_mesh(8, tp=2)
    sharded = make_fused_extract_train_step(encoder, head, tx, cfg, mesh)
    with mesh:
        enc_s, state_s = place_fused(enc_params, state, mesh)
        _s2, m2 = sharded(enc_s, state_s, clean, noisy, scalars,
                          jnp.zeros(4), jax.random.PRNGKey(1), bank)
    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=2e-4)

    # misconfiguration: bank mode without an SNR is rejected
    import pytest

    with pytest.raises(ValueError, match="inject_snr"):
        make_fused_extract_train_step(
            encoder, head, tx,
            FusedConfig(encoder=TINY_ENC, dad=CFG,
                        inject_noise_bank_mode="fixed"),
            mesh=None,
        )


def test_feature_trainer_dp_mesh_matches_single(rng, tmp_path):
    """CrossDomainTrainer(mesh=dp8) epoch == single-device epoch on the same
    data — the mesh-wired TRAINER capability, not just the isolated step."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.store import (
        load_feature_store,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.dad_trainer import (
        CrossDomainTrainer,
    )
    from helpers import make_iemocap_dir

    d, *_ = make_iemocap_dir(tmp_path / "clean", n=60, dim=16)
    d2, *_ = make_iemocap_dir(tmp_path / "root2-10db", n=60, dim=16, seed=1)
    lm = {"ang": 0, "hap": 1, "neu": 2, "sad": 3}
    clean = load_feature_store(d, lm)
    noisy = load_feature_store(d2, lm)

    def trainer_for(mesh, base):
        cfg = dad_preset(
            "iemocap", input_dim=16, hidden_dim=8, batch_size=16,
            warmup_epochs=1, ecda_start_epoch=1, epochs=4,
            weight_ramp_epochs=2, clean_data_dir="clean",
            noisy_data_dir="root2-10db",
            results_base_dir=str(tmp_path / base),
        )
        return CrossDomainTrainer(
            cfg, fold=0, clean_store=clean, noisy_store=noisy,
            prefetch_depth=0, mesh=mesh,
        )

    t1 = trainer_for(None, "r1")
    avg1 = [t1.train_epoch(e) for e in range(2)]

    mesh = make_mesh(8, tp=1, axis_names=("dp",))
    with mesh:
        t8 = trainer_for(mesh, "r8")
        avg8 = [t8.train_epoch(e) for e in range(2)]
    for a, b in zip(avg1, avg8):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=2e-4, atol=1e-5)
    # DACP state evolved identically
    np.testing.assert_allclose(
        np.asarray(t1.state.dacp.ema_thresholds),
        np.asarray(t8.state.dacp.ema_thresholds), rtol=1e-4,
    )
    # mesh + scan_chunk is an explicit error, not silent misbehavior
    import pytest

    with pytest.raises(ValueError, match="scan_chunk"):
        cfg = dad_preset("iemocap", input_dim=16, batch_size=16,
                         clean_data_dir="c", noisy_data_dir="n")
        CrossDomainTrainer(cfg, clean_store=clean, noisy_store=noisy,
                           scan_chunk=4, mesh=mesh)


def test_sharded_extraction_matches_single_device(rng):
    """dp(+tp)-sharded FeatureExtractor returns the same features as the
    unsharded path (models/extract.py mesh support)."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.emotion2vec import (
        Emotion2vecEncoder,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.extract import (
        FeatureExtractor,
    )

    enc = Emotion2vecEncoder(TINY_ENC)
    wav0 = np.zeros((1, 400), np.float32)
    params = enc.init(jax.random.PRNGKey(0), wav0, np.ones((1, 400), bool))
    clips = [rng.normal(size=n).astype(np.float32) * 0.1
             for n in (350, 420, 500, 610, 700, 380, 450, 520)]

    base = FeatureExtractor(TINY_ENC, params, batch_size=8, buckets=(512, 1024))
    ref = base.extract_clips(clips)

    for kwargs in (dict(axis_names=("dp",)), dict(tp=2)):
        mesh = make_mesh(8, **kwargs)
        sharded = FeatureExtractor(TINY_ENC, params, batch_size=8,
                                   buckets=(512, 1024), mesh=mesh)
        got = sharded.extract_clips(clips)
        for a, b in zip(ref, got):
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, rtol=0, atol=2e-5)


def test_sharded_extraction_rejects_indivisible_batch():
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.emotion2vec import (
        Emotion2vecEncoder,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.extract import (
        FeatureExtractor,
    )
    import pytest

    enc = Emotion2vecEncoder(TINY_ENC)
    wav0 = np.zeros((1, 400), np.float32)
    params = enc.init(jax.random.PRNGKey(0), wav0, np.ones((1, 400), bool))
    mesh = make_mesh(8, axis_names=("dp",))
    with pytest.raises(ValueError, match="divide"):
        FeatureExtractor(TINY_ENC, params, batch_size=6, mesh=mesh)


@pytest.mark.slow
def test_cached_clean_features_matches_inline_extraction(rng):
    """cache_clean_features: precomputed clean features + noisy-only
    extraction must reproduce the inline two-extraction step exactly
    (the clean stream has no per-step randomness)."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.parallel import (
        precompute_clean_features,
    )
    import dataclasses

    cfg = FusedConfig(encoder=TINY_ENC, dad=CFG)
    encoder, enc_params, head, tx, state = init_fused(
        cfg, jax.random.PRNGKey(0), example_len=256
    )
    clean, noisy = _fused_batch(rng), _fused_batch(rng, labeled=False)
    scalars = StepScalars.for_epoch(CFG, 4)
    key = jax.random.PRNGKey(1)

    inline = make_fused_extract_train_step(encoder, head, tx, cfg, mesh=None)
    s1, m1 = inline(enc_params, state, clean, noisy, scalars, jnp.zeros(4), key)

    cfg_c = dataclasses.replace(cfg, cache_clean_features=True)
    _e, _p, _h, tx2, state2 = init_fused(cfg_c, jax.random.PRNGKey(0), example_len=256)
    cached_clean = precompute_clean_features(encoder, enc_params, cfg_c, clean)
    cached = make_fused_extract_train_step(encoder, head, tx2, cfg_c, mesh=None)
    s2, m2 = cached(enc_params, state2, cached_clean, noisy, scalars,
                    jnp.zeros(4), key)

    for k in ("total_loss", "supervised_ce_loss", "consistency_loss", "ecda_loss"):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-5,
                                   err_msg=k)
    np.testing.assert_allclose(
        np.asarray(s1.ssrl.student["params"]["encoder"]["pre_net"]["kernel"]),
        np.asarray(s2.ssrl.student["params"]["encoder"]["pre_net"]["kernel"]),
        rtol=1e-5, atol=1e-6,
    )


def test_cached_clean_features_multichip(rng):
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.parallel import (
        precompute_clean_features,
    )

    cfg = FusedConfig(encoder=TINY_ENC, dad=CFG, inject_snr_db=10.0,
                      cache_clean_features=True)
    encoder, enc_params, head, tx, state = init_fused(
        cfg, jax.random.PRNGKey(0), example_len=256
    )
    mesh = make_mesh(8, tp=2)
    step = make_fused_extract_train_step(encoder, head, tx, cfg, mesh)
    with mesh:
        enc_s, state_s = place_fused(enc_params, state, mesh)
        clean = precompute_clean_features(encoder, enc_params, cfg, _fused_batch(rng))
        noisy = _fused_batch(rng, labeled=False)
        scalars = StepScalars.for_epoch(CFG, 4)
        state2, metrics = step(
            enc_s, state_s, clean, noisy, scalars, jnp.zeros(4), jax.random.PRNGKey(1)
        )
        assert np.isfinite(float(metrics["total_loss"]))


def test_resident_block_gather_matches_element_semantics():
    """Round 5: 1-D resident corpora are 128-sample slot-aligned so
    gather_clips fetches whole blocks (the element-wise HBM gather
    measured 0.1 GB/s on v5e — slower than the whole encoder step). The
    block path must reproduce host row assembly exactly, including rows
    whose bucket t overruns the clip's slot (reads bleed into the next
    clip's slot and must be masked to zero) and the corpus tail clamp."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.parallel.resident import (
        _ALIGN, gather_clips, resident_from_flat,
    )

    rng = np.random.default_rng(7)
    sizes = np.array([5, 130, 257, 128, 1, 384, 77], np.int64)
    flat = rng.normal(size=int(sizes.sum())).astype(np.float32)
    c = resident_from_flat(flat, sizes)
    # construction invariant: aligned slots, zero fill between clips
    offs = np.asarray(c.offsets)
    assert (offs % _ALIGN == 0).all()
    assert np.asarray(c.flat).shape[0] % _ALIGN == 0
    src = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    for i, n in enumerate(sizes):
        np.testing.assert_array_equal(
            np.asarray(c.flat)[offs[i] : offs[i] + n],
            flat[src[i] : src[i] + int(n)],
        )

    # t = 384 (multiple of _ALIGN -> block path), incl. a padded row (-1),
    # the LAST clip (tail clamp), and clips far shorter than t
    idx = np.array([0, 6, 3, -1, 5], np.int32)
    t = 384
    out, pad = jax.jit(
        lambda cc, ii: gather_clips(cc, ii, t), static_argnums=()
    )(c, jnp.asarray(idx))
    out, pad = np.asarray(out), np.asarray(pad)
    for row, ci in enumerate(idx):
        if ci < 0:
            assert pad[row].all() and (out[row] == 0).all()
            continue
        n = min(int(sizes[ci]), t)
        np.testing.assert_array_equal(out[row, :n], flat[src[ci] : src[ci] + n])
        assert (out[row, n:] == 0).all()
        np.testing.assert_array_equal(pad[row], np.arange(t) >= sizes[ci])

    # t NOT a block multiple takes the element path — same values
    t2 = 200
    out2, pad2 = gather_clips(c, jnp.asarray(idx), t2)
    out2 = np.asarray(out2)
    for row, ci in enumerate(idx):
        if ci < 0:
            continue
        n = min(int(sizes[ci]), t2)
        np.testing.assert_array_equal(out2[row, :n], flat[src[ci] : src[ci] + n])
        assert (out2[row, n:] == 0).all()
