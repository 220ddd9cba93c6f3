import jax
import jax.numpy as jnp
import numpy as np
import torch

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
    AugmentConfig,
    DACPConfig,
    ECDAConfig,
    dad_preset,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.dad import (
    DACPState,
    certainty_scores,
    dacp_epoch_update,
    dacp_mask,
    ecda_loss,
    init_dacp,
    strong_augment,
    weak_augment,
)


# ---------------------------------------------------------------------------
# torch/numpy oracles implementing the published DACP/ECDA formulas with
# boolean indexing (the reference's idiom), used to validate the masked
# shape-static JAX versions.
# ---------------------------------------------------------------------------

def oracle_certainty(probs, use_entropy=True):
    maxp = probs.max(-1)
    preds = probs.argmax(-1)
    if not use_entropy:
        return maxp, preds
    ent = -(probs * np.log2(probs + 1e-8)).sum(-1)
    return maxp * (1 - ent / np.log2(probs.shape[-1])), preds


def oracle_dacp_mask(quality, ema_thr, probs, gamma, anchors, cfg: DACPConfig):
    scores, preds = oracle_certainty(probs, cfg.use_entropy_in_score)
    C = probs.shape[-1]
    wce = 1 / (1 + np.exp(-cfg.sensitivity_k * (quality - quality.mean())))
    thr = np.zeros(C)
    for c in range(C):
        cs = scores[preds == c]
        thr[c] = (
            float(torch.quantile(torch.from_numpy(cs), gamma))
            if len(cs)
            else ema_thr[c]
        )
    dyn = thr + cfg.calibration_strength_lambda * (wce - 0.5)
    floored = np.maximum(dyn, anchors)
    new_thr = cfg.threshold_smoothing_alpha * ema_thr + (
        1 - cfg.threshold_smoothing_alpha
    ) * floored
    mask = scores >= new_thr[preds]
    return new_thr, mask, scores, wce, preds


def oracle_gaussian_terms(src, tgt, w_s, w_t, mul=2.0, num=5):
    total = torch.cat([src, tgt], 0)
    l2 = torch.cdist(total, total, p=2) ** 2
    n = total.shape[0]
    bw = l2.sum() / (n * n - n) if n > 1 else torch.tensor(1.0)
    bw = bw / (mul ** (num // 2))
    K = sum(torch.exp(-l2 / (bw * (mul**i) + 1e-8)) for i in range(num))
    ns = src.shape[0]
    Kss, Ktt, Kst = K[:ns, :ns], K[ns:, ns:], K[:ns, ns:]
    Wss = torch.outer(w_s, w_s)
    Wtt = torch.outer(w_t, w_t)
    Wst = torch.outer(w_s, w_t)
    return (
        (Kss * Wss).sum() / (Wss.sum() + 1e-8),
        (Ktt * Wtt).sum() / (Wtt.sum() + 1e-8),
        (Kst * Wst).sum() / (Wst.sum() + 1e-8),
    )


def oracle_ecda(
    clean, noisy, clean_lbl, noisy_lbl, mask, scores, wce, cfg: ECDAConfig
):
    clean = torch.from_numpy(clean)
    noisy = torch.from_numpy(noisy)
    C = len(wce)
    total = torch.tensor(0.0)
    mask = torch.from_numpy(mask)

    cents, have = [], []
    for c in range(C):
        sel = torch.from_numpy(noisy_lbl == c) & mask
        if sel.sum() > 0:
            cents.append(noisy[sel].mean(0))
            have.append(c)
    rep = torch.tensor(0.0)
    if len(cents) > 1:
        rep = -torch.pdist(torch.stack(cents), p=2).mean()

    wce_t = torch.from_numpy(wce)
    attn = torch.exp(cfg.class_attention_lambda * (wce_t.mean() - wce_t))
    for c in range(C):
        cc = clean[torch.from_numpy(clean_lbl == c)]
        sel = torch.from_numpy(noisy_lbl == c) & mask
        nc = noisy[sel]
        if len(cc) < 2 or len(nc) < 2:
            continue
        w_s = torch.ones(len(cc))
        w_t = torch.from_numpy(scores)[sel]
        ss, tt, st = oracle_gaussian_terms(cc, nc, w_s, w_t, cfg.kernel_mul, cfg.kernel_num)
        mmd = ss + tt - 2 * st
        cent = nc.mean(0)
        compact = ((nc - cent) ** 2).sum(1).mean()
        total = total + attn[c] * (
            mmd + cfg.compactness_weight_gamma * compact + cfg.repulsion_weight_delta * rep
        )
    return float(total)


def _rand_probs(rng, B, C):
    logits = rng.normal(size=(B, C)) * 2
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return (e / e.sum(-1, keepdims=True)).astype(np.float32)


def test_certainty_scores_match_oracle(rng):
    probs = _rand_probs(rng, 32, 4)
    s, p = certainty_scores(jnp.asarray(probs), True)
    so, po = oracle_certainty(probs, True)
    np.testing.assert_allclose(np.asarray(s), so, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(p), po)


def test_dacp_mask_matches_oracle(rng):
    cfg = DACPConfig()
    B, C = 48, 4
    probs = _rand_probs(rng, B, C)
    quality = rng.uniform(0.3, 0.7, C).astype(np.float32)
    ema_thr = rng.uniform(0.4, 0.6, C).astype(np.float32)
    anchors = rng.uniform(0.0, 0.3, C).astype(np.float32)
    gamma = 0.55

    state = DACPState(
        quality=jnp.asarray(quality),
        ema_thresholds=jnp.asarray(ema_thr),
        score_sums=jnp.zeros(C),
        score_counts=jnp.zeros(C),
    )
    new_state, mask, scores, wce = dacp_mask(
        state, jnp.asarray(probs), jnp.ones(B, bool), gamma, jnp.asarray(anchors), cfg
    )
    ref_thr, ref_mask, ref_scores, ref_wce, ref_preds = oracle_dacp_mask(
        quality, ema_thr, probs, gamma, anchors, cfg
    )
    np.testing.assert_allclose(np.asarray(new_state.ema_thresholds), ref_thr, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(mask), ref_mask)
    np.testing.assert_allclose(np.asarray(wce), ref_wce, rtol=1e-5)
    # score buffers: per-class sums of scores grouped by predicted class
    for c in range(4):
        np.testing.assert_allclose(
            float(new_state.score_sums[c]), ref_scores[ref_preds == c].sum(), rtol=1e-5
        )
        assert float(new_state.score_counts[c]) == (ref_preds == c).sum()


def test_dacp_mask_respects_row_valid(rng):
    cfg = DACPConfig()
    B, C = 16, 4
    probs = _rand_probs(rng, B, C)
    valid = np.ones(B, bool)
    valid[-5:] = False
    state = init_dacp(C)
    new_state, mask, _s, _w = dacp_mask(
        state, jnp.asarray(probs), jnp.asarray(valid), 0.5, jnp.zeros(C), cfg
    )
    assert not np.asarray(mask)[-5:].any()
    # invalid rows excluded from buffers and thresholds
    ref_thr, ref_mask, *_ = oracle_dacp_mask(
        np.full(C, 0.5), np.full(C, 0.5), probs[:11], 0.5, np.zeros(C), cfg
    )
    np.testing.assert_allclose(np.asarray(new_state.ema_thresholds), ref_thr, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(mask)[:11], ref_mask)
    assert float(new_state.score_counts.sum()) == 11


def test_dacp_epoch_update_matches_list_mean_semantics(rng):
    cfg = DACPConfig(quality_smoothing_beta=0.9)
    C = 4
    state = init_dacp(C)
    # simulate two batches of buffered scores
    all_scores = [[] for _ in range(C)]
    for _ in range(2):
        probs = _rand_probs(rng, 32, C)
        state, _m, s, _w = dacp_mask(
            state, jnp.asarray(probs), jnp.ones(32, bool), 0.5, jnp.zeros(C), cfg
        )
        _so, po = oracle_certainty(probs)
        so = np.asarray(s)
        for c in range(C):
            all_scores[c].extend(so[po == c].tolist())
    updated = dacp_epoch_update(state, cfg)
    for c in range(C):
        expected = 0.9 * 0.5 + 0.1 * (np.mean(all_scores[c]) if all_scores[c] else 0.5)
        np.testing.assert_allclose(float(updated.quality[c]), expected, rtol=1e-5)
    assert float(updated.score_counts.sum()) == 0


def test_ecda_matches_oracle(rng):
    cfg = ECDAConfig()
    Bs, Bt, D, C = 24, 24, 8, 4
    clean = rng.normal(size=(Bs, D)).astype(np.float32)
    noisy = (rng.normal(size=(Bt, D)) + 0.5).astype(np.float32)
    clean_lbl = rng.integers(0, C, Bs).astype(np.int32)
    noisy_lbl = rng.integers(0, C, Bt).astype(np.int32)
    mask = rng.uniform(size=Bt) > 0.3
    scores = rng.uniform(0.3, 1.0, Bt).astype(np.float32)
    wce = rng.uniform(0.2, 0.8, C).astype(np.float32)

    ours = float(
        ecda_loss(
            jnp.asarray(clean),
            jnp.asarray(noisy),
            jnp.asarray(clean_lbl),
            jnp.asarray(noisy_lbl),
            jnp.asarray(mask),
            jnp.asarray(scores),
            jnp.asarray(wce),
            jnp.ones(Bs, bool),
            jnp.ones(Bt, bool),
            cfg,
        )
    )
    ref = oracle_ecda(clean, noisy, clean_lbl, noisy_lbl, mask, scores, wce, cfg)
    np.testing.assert_allclose(ours, ref, rtol=2e-4)


def test_ecda_global_branch_matches_oracle(rng):
    cfg = ECDAConfig(use_class_aware_mmd=False)
    clean = rng.normal(size=(16, 6)).astype(np.float32)
    noisy = (rng.normal(size=(16, 6)) + 1).astype(np.float32)
    mask = rng.uniform(size=16) > 0.4
    ours = float(
        ecda_loss(
            jnp.asarray(clean),
            jnp.asarray(noisy),
            jnp.zeros(16, jnp.int32),
            jnp.zeros(16, jnp.int32),
            jnp.asarray(mask),
            jnp.ones(16),
            jnp.ones(4),
            jnp.ones(16, bool),
            jnp.ones(16, bool),
            cfg,
        )
    )
    src = torch.from_numpy(clean)
    tgt = torch.from_numpy(noisy[mask])
    ss, tt, st = oracle_gaussian_terms(
        src, tgt, torch.ones(len(src)), torch.ones(len(tgt))
    )
    np.testing.assert_allclose(ours, float(ss + tt - 2 * st), rtol=2e-4)


def test_ecda_padded_rows_are_inert(rng):
    """Adding padded rows must not change the loss (shape-static invariance)."""
    cfg = ECDAConfig()
    Bs, Bt, D, C = 12, 12, 6, 4
    clean = rng.normal(size=(Bs, D)).astype(np.float32)
    noisy = (rng.normal(size=(Bt, D)) + 0.5).astype(np.float32)
    clean_lbl = rng.integers(0, C, Bs).astype(np.int32)
    noisy_lbl = rng.integers(0, C, Bt).astype(np.int32)
    mask = rng.uniform(size=Bt) > 0.3
    scores = rng.uniform(0.3, 1.0, Bt).astype(np.float32)
    wce = rng.uniform(0.2, 0.8, C).astype(np.float32)

    def run(cl, no, cl_l, no_l, m, s, cv, nv):
        return float(
            ecda_loss(
                jnp.asarray(cl), jnp.asarray(no), jnp.asarray(cl_l),
                jnp.asarray(no_l), jnp.asarray(m), jnp.asarray(s),
                jnp.asarray(wce), jnp.asarray(cv), jnp.asarray(nv), cfg,
            )
        )

    base = run(clean, noisy, clean_lbl, noisy_lbl, mask, scores,
               np.ones(Bs, bool), np.ones(Bt, bool))
    # append garbage rows marked invalid
    pad = np.full((4, D), 7.7, np.float32)
    padded = run(
        np.concatenate([clean, pad]),
        np.concatenate([noisy, pad]),
        np.concatenate([clean_lbl, np.zeros(4, np.int32)]),
        np.concatenate([noisy_lbl, np.zeros(4, np.int32)]),
        np.concatenate([mask, np.ones(4, bool)]),
        np.concatenate([scores, np.ones(4, np.float32)]),
        np.concatenate([np.ones(Bs, bool), np.zeros(4, bool)]),
        np.concatenate([np.ones(Bt, bool), np.zeros(4, bool)]),
    )
    np.testing.assert_allclose(base, padded, rtol=1e-4)


def test_augmentations(rng):
    cfg = AugmentConfig()
    x = jnp.asarray(rng.normal(size=(8, 40, 32)).astype(np.float32))
    weak = np.asarray(weak_augment(jax.random.PRNGKey(0), x, cfg))
    assert np.std(weak - np.asarray(x)) < 0.02  # sigma 0.01

    strong = np.asarray(strong_augment(jax.random.PRNGKey(1), x, cfg))
    # some feature channels fully zeroed (channel dropout, shared over batch)
    zero_channels = np.all(strong == 0, axis=(0, 1))
    # temporal masking: each sample has a contiguous run of int(40*0.1)=4
    # zero frames
    zero_frames = np.all(strong == 0, axis=2)  # (B, T)
    for b in range(8):
        runs = np.flatnonzero(zero_frames[b])
        assert len(runs) >= 4
    # statistically some channels dropped (rate 0.1 over 32 channels)
    assert 0 <= zero_channels.sum() <= 12


def test_strong_augment_mask_uses_batch_max_not_bucket(rng):
    """Bucket padding must not lengthen the temporal mask: mask length and
    start derive from the batch's valid max (the reference's collated t),
    and masks never start inside pure padding."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
        AugmentConfig,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.dad.augment import (
        strong_augment,
    )

    B, T, D = 4, 64, 3  # bucket T=64, but the longest clip is 40 frames
    lengths = np.array([40, 30, 20, 35])
    x = jnp.asarray(np.full((B, T, D), 5.0, np.float32))
    pm = np.ones((B, T), bool)
    for i, L in enumerate(lengths):
        pm[i, :L] = False
    cfg = AugmentConfig(strong_noise_std=0.0, feature_dropout_rate=0.0,
                        temporal_mask_ratio=0.1)
    zero_rows = []
    for s in range(40):
        out = np.asarray(
            strong_augment(jax.random.PRNGKey(s), x, cfg,
                           padding_mask=jnp.asarray(pm))
        )
        masked = out[:, :, 0] == 0.0
        # mask length int(40 * 0.1) = 4 (NOT int(64*0.1)=6)
        assert masked.sum(axis=1).max() == 4
        # and the mask never starts beyond valid_max
        assert not masked[:, 40:].any() or masked[:, :40].any()
        zero_rows.append(masked.any(axis=1))
    # all rows get masked sometimes (start < t_valid for every row length)
    assert np.stack(zero_rows).any(axis=0).all()


# ---------------------------------------------------------------------------
# THE REFERENCE'S OWN CODE as the oracle: import DACPManager / ECDALoss from
# the reference checkout (torch+numpy only, config module stubbed) and assert
# value-level agreement with dad/dacp.py and dad/ecda.py on random batches.
# This closes the "builder wrote both sides" loophole: the comparison target
# here is the reference's executable behavior, not a re-derivation.
# ---------------------------------------------------------------------------
REF_UTILS = "/root/reference/IEMOCAP/DAD-train-IEMOCAP/utils.py"


def _load_reference_utils(dadcfg):
    """Imports the reference utils.py with a stub ``config`` module built
    from the given preset's knobs."""
    import importlib.util
    import sys
    import types

    cfgmod = types.ModuleType("config")
    d, e = dadcfg.dacp, dadcfg.ecda
    cfgmod.USE_ENTROPY_IN_SCORE = d.use_entropy_in_score
    cfgmod.FIXED_CONFIDENCE_THRESHOLD = d.fixed_confidence_threshold
    cfgmod.DACP_QUALITY_SMOOTHING_BETA = d.quality_smoothing_beta
    cfgmod.DACP_SENSITIVITY_K = d.sensitivity_k
    cfgmod.DACP_QUANTILE_START = d.quantile_start
    cfgmod.DACP_QUANTILE_END = d.quantile_end
    cfgmod.DACP_CALIBRATION_STRENGTH_LAMBDA = d.calibration_strength_lambda
    cfgmod.DACP_THRESHOLD_SMOOTHING_ALPHA = d.threshold_smoothing_alpha
    cfgmod.USE_CLASS_AWARE_MMD = True
    cfgmod.ECDA_CLASS_ATTENTION_LAMBDA = e.class_attention_lambda
    cfgmod.ECDA_COMPACTNESS_WEIGHT_GAMMA = e.compactness_weight_gamma
    cfgmod.ECDA_REPULSION_WEIGHT_DELTA = e.repulsion_weight_delta
    # knobs utils.py reads elsewhere (augment defaults); harmless constants
    cfgmod.WEAK_NOISE_STD = 0.01
    cfgmod.STRONG_NOISE_STD = 0.05
    cfgmod.DROPOUT_RATE = 0.1
    cfgmod.TEMPORAL_MASK_RATIO = 0.1

    old = sys.modules.get("config")
    sys.modules["config"] = cfgmod
    try:
        spec = importlib.util.spec_from_file_location("ref_dad_utils", REF_UTILS)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        if old is not None:
            sys.modules["config"] = old
        else:
            sys.modules.pop("config", None)
    return mod, cfgmod


def _rand_probs(rng, b, c):
    z = rng.normal(size=(b, c)) * 2.0
    p = np.exp(z) / np.exp(z).sum(-1, keepdims=True)
    return p.astype(np.float32)


import pytest as _pytest


@_pytest.mark.skipif(not __import__("os").path.exists(REF_UTILS),
                     reason="reference checkout absent")
def test_reference_dacp_manager_is_the_oracle(rng):
    """dad/dacp.py vs the REFERENCE DACPManager, value-level, over several
    batches + an epoch-end quality update (utils.py:379-507)."""
    import sys
    import types

    dadcfg = dad_preset("iemocap")
    ref, cfgmod = _load_reference_utils(dadcfg)
    sys.modules["config"] = cfgmod  # method-local `import config as cfg`
    try:
        C, B, total_epochs = 4, 24, 50
        mgr = ref.DACPManager(C, total_epochs, torch.device("cpu"))
        state = init_dacp(C)
        anchors = (rng.random(C) * 0.1).astype(np.float32)
        for i, epoch in enumerate([5, 5, 5, 12, 12, 30]):
            probs = _rand_probs(rng, B, C)
            gamma = (dadcfg.dacp.quantile_start
                     + (dadcfg.dacp.quantile_end - dadcfg.dacp.quantile_start)
                     * epoch / total_epochs)
            r_mask, r_scores, r_wce = mgr.calculate_mask(
                torch.from_numpy(probs), epoch, torch.from_numpy(anchors)
            )
            state, mask, scores, wce = dacp_mask(
                state, jnp.asarray(probs), jnp.ones(B, bool), gamma,
                jnp.asarray(anchors), dadcfg.dacp,
            )
            np.testing.assert_allclose(np.asarray(scores),
                                       r_scores.numpy(), atol=1e-5)
            np.testing.assert_allclose(np.asarray(wce), r_wce.numpy(),
                                       atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(state.ema_thresholds), mgr.ema_thresholds.numpy(),
                atol=1e-5,
            )
            np.testing.assert_array_equal(np.asarray(mask),
                                          r_mask.numpy().astype(bool))
        # epoch end: per-class mean score -> quality EMA
        mgr.update_class_quality_scores_epoch(mgr.batch_scores_per_class)
        state = dacp_epoch_update(state, dadcfg.dacp)
        np.testing.assert_allclose(
            np.asarray(state.quality), mgr.class_quality_scores.numpy(),
            atol=1e-5,
        )
    finally:
        sys.modules.pop("config", None)


@_pytest.mark.skipif(not __import__("os").path.exists(REF_UTILS),
                     reason="reference checkout absent")
def test_reference_ecda_loss_is_the_oracle(rng):
    """dad/ecda.py vs the REFERENCE ECDALoss (utils.py:509-660), including
    the absent-class gating and the clip where a class has <2 members."""
    import sys

    dadcfg = dad_preset("iemocap")
    ref, cfgmod = _load_reference_utils(dadcfg)
    sys.modules["config"] = cfgmod
    try:
        C, Bs, Bt, D = 4, 20, 24, 16
        crit = ref.ECDALoss(kernel_mul=dadcfg.ecda.kernel_mul,
                            kernel_num=dadcfg.ecda.kernel_num)
        for trial in range(4):
            clean = rng.normal(size=(Bs, D)).astype(np.float32)
            noisy = rng.normal(size=(Bt, D)).astype(np.float32)
            clean_labels = rng.integers(0, C, Bs).astype(np.int32)
            preds = rng.integers(0, C, Bt).astype(np.int32)
            mask = rng.random(Bt) > (0.3 if trial < 2 else 0.7)
            scores = rng.random(Bt).astype(np.float32)
            wce = (0.3 + 0.4 * rng.random(C)).astype(np.float32)
            r = crit(
                torch.from_numpy(clean), torch.from_numpy(noisy),
                torch.from_numpy(clean_labels.astype(np.int64)),
                torch.from_numpy(preds.astype(np.int64)),
                torch.from_numpy(mask), torch.from_numpy(scores),
                torch.from_numpy(wce),
            ).item()
            ours = float(ecda_loss(
                jnp.asarray(clean), jnp.asarray(noisy),
                jnp.asarray(clean_labels), jnp.asarray(preds),
                jnp.asarray(mask), jnp.asarray(scores), jnp.asarray(wce),
                jnp.ones(Bs, bool), jnp.ones(Bt, bool), dadcfg.ecda,
            ))
            np.testing.assert_allclose(ours, r, rtol=2e-4, atol=1e-5)
    finally:
        sys.modules.pop("config", None)
