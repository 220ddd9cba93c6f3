import jax
import jax.numpy as jnp
import numpy as np
import torch

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
    dad_preset,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.dad import (
    StepScalars,
    init_dad_train_state,
    make_dad_train_step,
    run_anchor_calibration,
    set_learning_rate,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.dad.train_step import (
    cosine_lr,
    epoch_end_dacp,
    smoothed_ce,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.batching import (
    Batch,
)

CFG = dad_preset("iemocap", input_dim=16, hidden_dim=8, batch_size=12,
                 warmup_epochs=2, ecda_start_epoch=2, epochs=10,
                 weight_ramp_epochs=2)


def _batch(rng, B=12, T=6, D=16, labeled=True, seed_shift=0.0):
    feats = (rng.normal(size=(B, T, D)) + seed_shift).astype(np.float32)
    pm = np.zeros((B, T), bool)
    pm[:, 4:] = True
    labels = rng.integers(0, 4, B).astype(np.int32) if labeled else np.full(B, -1, np.int32)
    # make features class-dependent so CE is learnable
    if labeled:
        for i in range(B):
            feats[i] += labels[i] * 0.5
    return Batch(
        feats=feats,
        padding_mask=pm,
        labels=labels,
        ids=np.arange(B, dtype=np.int32),
        row_valid=np.ones(B, bool),
    )


def test_smoothed_ce_matches_torch(rng):
    logits = rng.normal(size=(10, 4)).astype(np.float32)
    labels = rng.integers(0, 4, 10).astype(np.int32)
    ours = float(
        smoothed_ce(jnp.asarray(logits), jnp.asarray(labels), jnp.ones(10, bool), 0.05)
    )
    ref = float(
        torch.nn.CrossEntropyLoss(label_smoothing=0.05)(
            torch.from_numpy(logits), torch.from_numpy(labels).long()
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
    # invalid rows excluded
    valid = np.ones(10, bool)
    valid[7:] = False
    ours2 = float(
        smoothed_ce(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(valid), 0.05)
    )
    ref2 = float(
        torch.nn.CrossEntropyLoss(label_smoothing=0.05)(
            torch.from_numpy(logits[:7]), torch.from_numpy(labels[:7]).long()
        )
    )
    np.testing.assert_allclose(ours2, ref2, rtol=1e-5)


def test_step_scalars_schedule():
    s0 = StepScalars.for_epoch(CFG, 0)
    assert bool(s0.warmup) and float(s0.w_consistency) == 0.0
    s2 = StepScalars.for_epoch(CFG, 2)
    assert not bool(s2.warmup)
    np.testing.assert_allclose(float(s2.w_consistency), CFG.initial_consistency_weight, rtol=1e-6)
    s4 = StepScalars.for_epoch(CFG, 4)
    np.testing.assert_allclose(float(s4.w_consistency), CFG.final_consistency_weight, rtol=1e-6)
    np.testing.assert_allclose(float(s4.w_ecda), CFG.weight_ecda, rtol=1e-6)
    # gamma ramps 0.4 -> 0.8 linearly over epochs
    np.testing.assert_allclose(float(s0.gamma_e), 0.4, rtol=1e-6)
    np.testing.assert_allclose(
        float(StepScalars.for_epoch(CFG, 5).gamma_e), 0.4 + 0.4 * 0.5, rtol=1e-6
    )
    # cosine lr
    np.testing.assert_allclose(cosine_lr(CFG, 0), CFG.learning_rate)
    np.testing.assert_allclose(cosine_lr(CFG, 10), 0.0, atol=1e-12)


def test_warmup_step_freezes_teacher_and_dacp(rng):
    head, tx, state = init_dad_train_state(CFG, jax.random.PRNGKey(0))
    step = make_dad_train_step(head, tx, CFG)
    clean, noisy = _batch(rng), _batch(rng, labeled=False)
    anchors = jnp.zeros(4)
    s = StepScalars.for_epoch(CFG, 0)

    t_before = jax.tree.map(np.asarray, state.ssrl.teacher)
    s_before = np.array(state.ssrl.student["params"]["encoder"]["pre_net"]["kernel"])
    state2, metrics, _tr = step(state, clean, noisy, s, anchors, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["consistency_loss"]) == 0.0
    assert float(metrics["ecda_loss"]) == 0.0
    # teacher untouched during warmup
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        state2.ssrl.teacher,
        t_before,
    )
    # dacp untouched
    np.testing.assert_array_equal(np.asarray(state2.dacp.ema_thresholds), 0.5)
    assert float(state2.dacp.score_counts.sum()) == 0
    # student DID move
    diff = np.abs(
        np.asarray(state2.ssrl.student["params"]["encoder"]["pre_net"]["kernel"])
        - s_before
    ).max()
    assert diff > 0


def test_post_warmup_step_updates_everything(rng):
    head, tx, state = init_dad_train_state(CFG, jax.random.PRNGKey(0))
    step = make_dad_train_step(head, tx, CFG)
    clean, noisy = _batch(rng), _batch(rng, labeled=False, seed_shift=0.3)
    anchors = jnp.zeros(4)
    s = StepScalars.for_epoch(CFG, 5)

    t_before = np.asarray(state.ssrl.teacher["params"]["encoder"]["pre_net"]["kernel"])
    state2, metrics, tracking = step(state, clean, noisy, s, anchors, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    t_after = np.asarray(state2.ssrl.teacher["params"]["encoder"]["pre_net"]["kernel"])
    assert np.abs(t_after - t_before).max() > 0
    assert float(state2.dacp.score_counts.sum()) == 12
    assert not np.allclose(np.asarray(state2.dacp.ema_thresholds), 0.5)
    # tracking arrays shaped per noisy row
    assert tracking["pseudo_label"].shape == (12,)
    assert tracking["is_masked_in"].dtype == bool

    # epoch-end quality update changes quality
    state3 = epoch_end_dacp(state2, CFG)
    assert not np.allclose(np.asarray(state3.dacp.quality), 0.5)
    assert float(state3.dacp.score_counts.sum()) == 0


def test_training_reduces_ce(rng):
    head, tx, state = init_dad_train_state(CFG, jax.random.PRNGKey(0))
    step = make_dad_train_step(head, tx, CFG)
    anchors = jnp.zeros(4)
    s = StepScalars.for_epoch(CFG, 0)
    clean, noisy = _batch(rng), _batch(rng, labeled=False)
    first = None
    # 400 steps: the torch-faithful init (kaiming-uniform, ~3x smaller
    # variance than flax lecun_normal) memorizes the fixed batch slower
    for i in range(400):
        state, metrics, _ = step(state, clean, noisy, s, anchors, jax.random.PRNGKey(i))
        if first is None:
            first = float(metrics["supervised_ce_loss"])
    assert float(metrics["supervised_ce_loss"]) < first * 0.8


def test_learning_rate_injection(rng):
    head, tx, state = init_dad_train_state(CFG, jax.random.PRNGKey(0))
    step = make_dad_train_step(head, tx, CFG)
    new_opt = set_learning_rate(state.opt_state, 0.0)
    state = state._replace(opt_state=new_opt)
    clean, noisy = _batch(rng), _batch(rng, labeled=False)
    before = np.asarray(state.ssrl.student["params"]["encoder"]["pre_net"]["kernel"])
    state2, _m, _t = step(
        state, clean, noisy, StepScalars.for_epoch(CFG, 0), jnp.zeros(4),
        jax.random.PRNGKey(0),
    )
    after = np.asarray(state2.ssrl.student["params"]["encoder"]["pre_net"]["kernel"])
    np.testing.assert_array_equal(before, after)  # lr=0 -> no movement


def test_anchor_calibration(rng):
    head, tx, state = init_dad_train_state(CFG, jax.random.PRNGKey(0))
    clean_batches = [_batch(rng) for _ in range(2)]
    noisy_batches = [_batch(rng, seed_shift=0.5) for _ in range(2)]
    anchors = run_anchor_calibration(
        head, state.ssrl.student, clean_batches, noisy_batches, CFG
    )
    assert anchors.shape == (4,)
    assert np.all(anchors >= 0)
    assert np.all(np.isfinite(anchors))


def test_anchor_calibration_matches_reference_formula(rng):
    """anchors = clamp(mu_clean - k*sigma_clean, 0) * mu_noisy/(mu_clean+1e-8)
    grouped by TRUE labels (reference train.py:317-357)."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.dad.dacp import (
        certainty_scores,
    )

    head, tx, state = init_dad_train_state(CFG, jax.random.PRNGKey(0))
    clean = [_batch(rng) for _ in range(3)]
    noisy = [_batch(rng, seed_shift=0.4) for _ in range(3)]
    anchors = run_anchor_calibration(head, state.ssrl.student, clean, noisy, CFG)

    # oracle: recompute scores per true class with numpy lists
    import jax.numpy as _jnp

    def scores_of(b):
        logits, _ = head.apply(state.ssrl.student, _jnp.asarray(b.feats),
                               _jnp.asarray(b.padding_mask), deterministic=True)
        probs = jax.nn.softmax(logits, axis=-1)
        s, _p = certainty_scores(probs, CFG.dacp.use_entropy_in_score)
        return np.asarray(s)

    per_clean = [[] for _ in range(4)]
    per_noisy = [[] for _ in range(4)]
    for b in clean:
        s = scores_of(b)
        for i in range(len(s)):
            if b.row_valid[i]:
                per_clean[int(b.labels[i])].append(s[i])
    for b in noisy:
        s = scores_of(b)
        for i in range(len(s)):
            if b.row_valid[i]:
                per_noisy[int(b.labels[i])].append(s[i])
    mu_c = np.array([np.mean(x) if x else 0.0 for x in per_clean])
    sd_c = np.array([np.std(x) if x else 0.0 for x in per_clean])
    mu_n = np.array([np.mean(x) if x else 0.0 for x in per_noisy])
    expected = np.clip(mu_c - CFG.dacp.anchor_std_k * sd_c, 0, None) * (
        mu_n / (mu_c + 1e-8)
    )
    np.testing.assert_allclose(anchors, expected, rtol=1e-5, atol=1e-7)
