import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
    EncoderConfig,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models import (
    Emotion2vecEncoder,
    PretrainHead,
    ema_update,
    extract_features,
    init_ssrl,
    load_pretrain_into_ssrl,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.convert import (
    fairseq_to_flax_encoder,
    flax_pretrain_head_to_torch,
    ssrl_to_torch_state_dict,
    torch_state_dict_to_ssrl,
    torch_to_flax_pretrain_head,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.ops.masked import (
    masked_mean_pool,
    masked_quantile,
)

from torch_mirror import mirror_extract, rand_sd

TINY = EncoderConfig(
    embed_dim=16,
    depth=2,
    num_heads=2,
    prenet_depth=1,
    conv_feature_layers=((8, 4, 2), (8, 3, 2)),
    conv_pos_width=6,
    conv_pos_groups=2,
    conv_pos_depth=2,
    dtype="float32",
    use_flash_attention=False,
)


def test_encoder_parity_with_torch_mirror():
    """Converter + forward match the torch oracle bit-closely on a single
    unpadded clip (the reference's extraction mode)."""
    sd = rand_sd(TINY, seed=1)
    params = fairseq_to_flax_encoder(sd, TINY)
    model = Emotion2vecEncoder(TINY)

    rng = np.random.default_rng(0)
    wav = rng.normal(size=97).astype(np.float32)

    ref = mirror_extract(sd, TINY, wav, normalize=True)
    out, mask = extract_features(model, params, jnp.asarray(wav)[None, :])
    out = np.asarray(out)[0]
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_encoder_batched_padding_equals_per_clip():
    """Padded batched extraction == per-clip extraction on the valid frames
    (the fused TPU path must not change numbers)."""
    sd = rand_sd(TINY, seed=2)
    params = fairseq_to_flax_encoder(sd, TINY)
    model = Emotion2vecEncoder(TINY)
    rng = np.random.default_rng(1)
    lens = [97, 61]
    T = 128
    wavs = np.zeros((2, T), np.float32)
    pad = np.ones((2, T), bool)
    for i, L in enumerate(lens):
        wavs[i, :L] = rng.normal(size=L)
        pad[i, :L] = False

    out, frame_mask = extract_features(model, params, jnp.asarray(wavs), jnp.asarray(pad))
    out = np.asarray(out)
    frame_mask = np.asarray(frame_mask)

    for i, L in enumerate(lens):
        ref = mirror_extract(sd, TINY, wavs[i, :L], normalize=True)
        n_valid = int((~frame_mask[i]).sum())
        assert n_valid == ref.shape[0]
        np.testing.assert_allclose(out[i, :n_valid], ref, atol=3e-5, rtol=1e-4)


def test_pretrain_head_and_converter_roundtrip():
    head = PretrainHead()
    feats = jnp.asarray(np.random.default_rng(0).normal(size=(3, 10, 768)), jnp.float32)
    mask = jnp.zeros((3, 10), bool).at[1, 6:].set(True)
    params = head.init(jax.random.PRNGKey(0), feats, mask)
    logits = head.apply(params, feats, mask)
    assert logits.shape == (3, 4)

    sd = flax_pretrain_head_to_torch(params)
    back = torch_to_flax_pretrain_head(sd)
    logits2 = head.apply(back, feats, mask)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2), atol=1e-6)


def test_masked_mean_pool_matches_reference_semantics():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 3)), jnp.float32)
    mask = jnp.array([[False, False, True, True, True], [False] * 5])
    pooled = np.asarray(masked_mean_pool(x, mask))
    np.testing.assert_allclose(pooled[0], np.asarray(x)[0, :2].mean(0), rtol=1e-6)
    np.testing.assert_allclose(pooled[1], np.asarray(x)[1].mean(0), rtol=1e-6)


def test_masked_quantile_matches_torch():
    import torch

    rng = np.random.default_rng(3)
    scores = rng.uniform(size=16).astype(np.float32)
    member = rng.uniform(size=16) > 0.4
    for q in [0.0, 0.25, 0.4, 0.8, 1.0]:
        ours = float(
            masked_quantile(jnp.asarray(scores), jnp.asarray(member), q, 0.5)
        )
        ref = float(torch.quantile(torch.from_numpy(scores[member]), q))
        assert abs(ours - ref) < 1e-6, (q, ours, ref)
    # empty subset -> fallback
    empty = float(
        masked_quantile(jnp.asarray(scores), jnp.zeros(16, bool), 0.5, 0.77)
    )
    assert empty == pytest.approx(0.77)


def test_ssrl_ema_and_pretrain_loading():
    head, state = init_ssrl(jax.random.PRNGKey(0))
    # teacher starts identical
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        state.student,
        state.teacher,
    )
    # load pretrain weights into both
    ph = PretrainHead()
    feats = jnp.zeros((1, 4, 768), jnp.float32)
    mask = jnp.zeros((1, 4), bool)
    pp = ph.init(jax.random.PRNGKey(1), feats, mask)
    state = load_pretrain_into_ssrl(state, pp)
    np.testing.assert_allclose(
        np.asarray(state.student["params"]["encoder"]["pre_net"]["kernel"]),
        np.asarray(pp["params"]["pre_net"]["kernel"]),
    )
    np.testing.assert_allclose(
        np.asarray(state.teacher["params"]["classifier"]["fc_layer"]["bias"]),
        np.asarray(pp["params"]["post_net"]["bias"]),
    )

    # EMA: teacher moves toward student
    moved = jax.tree.map(lambda s: s + 1.0, state.student)
    state2 = ema_update(state._replace(student=moved), momentum=0.9)
    diff = np.asarray(
        state2.teacher["params"]["encoder"]["pre_net"]["bias"]
    ) - np.asarray(state.teacher["params"]["encoder"]["pre_net"]["bias"])
    np.testing.assert_allclose(diff, 0.1, rtol=1e-5)


def test_ssrl_torch_roundtrip():
    _head, state = init_ssrl(jax.random.PRNGKey(2))
    sd = ssrl_to_torch_state_dict(state)
    assert "student_encoder.pre_net.weight" in sd
    assert sd["teacher_classifier.fc_layer.weight"].shape == (4, 256)
    back = torch_state_dict_to_ssrl(sd)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        state.student,
        back.student,
    )


def test_gelu_approximate_close_to_exact():
    """tanh-approx GELU deviates from the exact erf path by less than the
    bf16 noise floor on realistic activations."""
    cfg_a = dataclasses.replace(TINY, gelu_approximate=True)
    sd = rand_sd(TINY, seed=5)
    params = fairseq_to_flax_encoder(sd, TINY)
    rng = np.random.default_rng(5)
    wav = rng.normal(size=120).astype(np.float32)
    out_exact, _ = extract_features(Emotion2vecEncoder(TINY), params, jnp.asarray(wav)[None])
    out_approx, _ = extract_features(Emotion2vecEncoder(cfg_a), params, jnp.asarray(wav)[None])
    diff = float(jnp.max(jnp.abs(out_exact - out_approx)))
    assert diff < 0.05, diff
