"""Value-level torch oracle for anchor calibration (reference
train.py:317-357): the full mu - k*sigma floor x (mu_noisy/mu_clean) ratio
pipeline, not just shapes."""

import numpy as np
import torch
import torch.nn.functional as F

import jax

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
    dad_preset,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.dad.calibrate import (
    run_anchor_calibration,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.batching import (
    Batch,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.heads import (
    init_ssrl,
)

D, H, C = 12, 8, 4


def make_batches(rng, n_batches, bs, t, with_invalid=False):
    out = []
    for bi in range(n_batches):
        T = t + bi  # varying lengths across batches
        feats = rng.normal(size=(bs, T, D)).astype(np.float32)
        lengths = rng.integers(2, T + 1, bs)
        pad = np.arange(T)[None, :] >= lengths[:, None]
        labels = rng.integers(0, C, bs).astype(np.int32)
        row_valid = np.ones(bs, bool)
        if with_invalid and bs > 2:
            row_valid[-1] = False  # padded row must be excluded
            labels[-2] = -1  # unlabeled row must be excluded
        out.append(
            Batch(feats, pad, labels, np.arange(bs, dtype=np.int32), row_valid)
        )
    return out


def torch_oracle_anchors(head_params, clean_batches, noisy_batches, k_std, use_entropy):
    """Reference train.py:317-357 semantics in torch: per-sample certainty
    scores bucketed per TRUE class, np.mean/np.std per class, anchor =
    clamp(mu_c - k*sigma_c, 0) * (mu_noisy / (mu_clean + 1e-8))."""
    p = head_params["params"]
    w1 = torch.from_numpy(np.asarray(p["encoder"]["pre_net"]["kernel"])).T.contiguous()
    b1 = torch.from_numpy(np.asarray(p["encoder"]["pre_net"]["bias"]))
    w2 = torch.from_numpy(np.asarray(p["classifier"]["fc_layer"]["kernel"])).T.contiguous()
    b2 = torch.from_numpy(np.asarray(p["classifier"]["fc_layer"]["bias"]))

    def predict(feats, pad):
        x = F.relu(F.linear(torch.from_numpy(feats), w1, b1))
        keep = (~torch.from_numpy(pad)).float().unsqueeze(-1)
        emb = (x * keep).sum(1) / keep.sum(1).clamp(min=1.0)
        return F.linear(emb, w2, b2)

    def collect(batches):
        per = [[] for _ in range(C)]
        for b in batches:
            probs = F.softmax(predict(b.feats, b.padding_mask), dim=1)
            mx, _ = probs.max(dim=1)
            if use_entropy:
                ent = -(probs * torch.log2(probs + 1e-8)).sum(1)
                scores = mx * (1 - ent / np.log2(C))
            else:
                scores = mx
            for i in range(len(scores)):
                if b.row_valid[i] and b.labels[i] >= 0:
                    per[int(b.labels[i])].append(float(scores[i]))
        return per

    pc, pn = collect(clean_batches), collect(noisy_batches)
    mu_c = np.array([np.mean(s) if s else 0.0 for s in pc])
    sd_c = np.array([np.std(s) if s else 0.0 for s in pc])
    mu_n = np.array([np.mean(s) if s else 0.0 for s in pn])
    return np.clip(mu_c - k_std * sd_c, 0, None) * (mu_n / (mu_c + 1e-8))


def test_anchor_calibration_values_match_torch_oracle(rng):
    cfg = dad_preset("iemocap", input_dim=D, hidden_dim=H)
    head, ssrl = init_ssrl(jax.random.PRNGKey(3), input_dim=D, hidden_dim=H)
    clean = make_batches(rng, 3, 6, 9, with_invalid=True)
    noisy = make_batches(rng, 2, 6, 11, with_invalid=True)

    got = run_anchor_calibration(head, ssrl.student, clean, noisy, cfg)
    want = torch_oracle_anchors(
        ssrl.student, clean, noisy, cfg.dacp.anchor_std_k,
        cfg.dacp.use_entropy_in_score,
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    assert np.all(got >= 0)


def test_anchor_calibration_no_entropy_branch(rng):
    cfg = dad_preset("iemocap", input_dim=D, hidden_dim=H)
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
        apply_overrides,
    )

    cfg = apply_overrides(cfg, {"USE_ENTROPY_IN_SCORE": False})
    head, ssrl = init_ssrl(jax.random.PRNGKey(5), input_dim=D, hidden_dim=H)
    clean = make_batches(rng, 2, 5, 8)
    noisy = make_batches(rng, 2, 5, 8)
    got = run_anchor_calibration(head, ssrl.student, clean, noisy, cfg)
    want = torch_oracle_anchors(ssrl.student, clean, noisy, cfg.dacp.anchor_std_k, False)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
