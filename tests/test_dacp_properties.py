"""Property tests: DACP masked implementation vs the boolean-indexing oracle
across the configuration space (entropy switch, alphas, lambdas, quantiles,
degenerate batches)."""

import jax.numpy as jnp
import numpy as np

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
    DACPConfig,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.dad import (
    DACPState,
    dacp_mask,
    fixed_threshold_mask,
)

from test_dad_core import _rand_probs, oracle_dacp_mask


def _state(rng, C=4):
    return DACPState(
        quality=jnp.asarray(rng.uniform(0.2, 0.8, C).astype(np.float32)),
        ema_thresholds=jnp.asarray(rng.uniform(0.3, 0.7, C).astype(np.float32)),
        score_sums=jnp.zeros(C),
        score_counts=jnp.zeros(C),
    )


def test_dacp_matches_oracle_across_configs(rng):
    C = 4
    for trial in range(12):
        cfg = DACPConfig(
            use_entropy_in_score=bool(rng.integers(0, 2)),
            sensitivity_k=float(rng.uniform(1, 20)),
            calibration_strength_lambda=float(rng.uniform(0, 1)),
            threshold_smoothing_alpha=float(rng.uniform(0.5, 0.99)),
        )
        B = int(rng.integers(4, 64))
        probs = _rand_probs(rng, B, C)
        gamma = float(rng.uniform(0.05, 0.95))
        anchors = rng.uniform(0, 0.5, C).astype(np.float32)
        state = _state(rng)
        quality = np.asarray(state.quality)
        thr = np.asarray(state.ema_thresholds)

        new_state, mask, scores, wce = dacp_mask(
            state, jnp.asarray(probs), jnp.ones(B, bool), gamma,
            jnp.asarray(anchors), cfg,
        )
        ref_thr, ref_mask, ref_scores, ref_wce, _p = oracle_dacp_mask(
            quality, thr, probs, gamma, anchors, cfg
        )
        np.testing.assert_allclose(
            np.asarray(new_state.ema_thresholds), ref_thr, rtol=2e-5, atol=1e-6,
            err_msg=f"trial {trial} cfg {cfg}",
        )
        np.testing.assert_array_equal(np.asarray(mask), ref_mask)
        np.testing.assert_allclose(np.asarray(scores), ref_scores, rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(wce), ref_wce, rtol=2e-5)


def test_dacp_single_class_batch(rng):
    """All samples predicted one class: other classes fall back to EMA
    thresholds (utils.py:483-484)."""
    C, B = 4, 16
    cfg = DACPConfig()
    probs = np.zeros((B, C), np.float32)
    probs[:, 2] = 0.9
    probs[:, [0, 1, 3]] = 0.1 / 3
    state = _state(rng)
    thr_before = np.asarray(state.ema_thresholds)
    new_state, mask, _s, wce = dacp_mask(
        state, jnp.asarray(probs), jnp.ones(B, bool), 0.5, jnp.zeros(C), cfg
    )
    ref_thr, ref_mask, *_ = oracle_dacp_mask(
        np.asarray(state.quality), thr_before, probs, 0.5, np.zeros(C), cfg
    )
    np.testing.assert_allclose(np.asarray(new_state.ema_thresholds), ref_thr, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(mask), ref_mask)
    # only class 2 collected scores
    counts = np.asarray(new_state.score_counts)
    assert counts[2] == B and counts[[0, 1, 3]].sum() == 0


def test_fixed_threshold_path(rng):
    probs = _rand_probs(rng, 20, 4)
    valid = np.ones(20, bool)
    valid[15:] = False
    mask, scores, wce = fixed_threshold_mask(jnp.asarray(probs), jnp.asarray(valid), 0.6)
    ref = probs.max(-1) >= 0.6
    np.testing.assert_array_equal(np.asarray(mask), ref & valid)
    assert np.asarray(wce).shape == (4,)
    # contract (shared with dacp_mask): RAW per-row scores, validity only in
    # the mask — use sites apply the mask themselves
    np.testing.assert_allclose(np.asarray(scores), probs.max(-1), rtol=1e-6)


def test_all_invalid_batch(rng):
    """A fully-padded batch leaves every piece of DACP state untouched."""
    C = 4
    cfg = DACPConfig()
    state = _state(rng)
    probs = _rand_probs(rng, 8, C)
    new_state, mask, _s, _w = dacp_mask(
        state, jnp.asarray(probs), jnp.zeros(8, bool), 0.5,
        jnp.zeros(C), cfg,
    )
    assert not np.asarray(mask).any()
    assert float(new_state.score_counts.sum()) == 0
    # thresholds still EMA toward the fallback values (reference would use
    # per-class EMA fallback since no class has members)
    expected = (
        cfg.threshold_smoothing_alpha * np.asarray(state.ema_thresholds)
        + (1 - cfg.threshold_smoothing_alpha)
        * np.maximum(
            np.asarray(state.ema_thresholds)
            + cfg.calibration_strength_lambda
            * (np.asarray(
                1 / (1 + np.exp(-cfg.sensitivity_k * (
                    np.asarray(state.quality) - np.asarray(state.quality).mean()
                )))
            ) - 0.5),
            0.0,
        )
    )
    np.testing.assert_allclose(
        np.asarray(new_state.ema_thresholds), expected, rtol=1e-5
    )
