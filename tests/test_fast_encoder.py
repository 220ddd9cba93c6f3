"""fast_ln / fast_softmax encoder paths: param-tree compatible with the
reference path and numerically at the rounding floor."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
    EncoderConfig,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models import (
    init_encoder,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.emotion2vec import (
    Emotion2vecEncoder,
)

SMALL = dict(
    embed_dim=64,
    depth=2,
    num_heads=4,
    prenet_depth=1,
    conv_feature_layers=((32, 4, 2), (32, 3, 2)),
    conv_pos_width=6,
    conv_pos_groups=2,
    conv_pos_depth=2,
    dtype="float32",
    use_flash_attention=False,
    gelu_approximate=True,
)


@pytest.mark.slow
def test_fast_path_param_tree_and_numerics(rng):
    ref_cfg = EncoderConfig(**SMALL)
    fast_cfg = EncoderConfig(**SMALL, fast_ln=True, fast_softmax=True)
    _model, params = init_encoder(ref_cfg, jax.random.PRNGKey(0), example_len=256)

    fast_model = Emotion2vecEncoder(fast_cfg)
    fast_params = fast_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256)))
    # identical parameter trees: checkpoints interchangeable between paths
    ref_paths = jax.tree_util.tree_structure(params)
    fast_paths = jax.tree_util.tree_structure(fast_params)
    assert ref_paths == fast_paths

    wav = jnp.asarray(rng.normal(size=(3, 256)).astype(np.float32)) * 0.1
    mask = jnp.zeros((3, 256), bool)
    ref_model = Emotion2vecEncoder(ref_cfg)
    ref_out, _ = ref_model.apply(params, wav, mask)
    fast_out, _ = fast_model.apply(params, wav, mask)
    np.testing.assert_allclose(
        np.asarray(ref_out), np.asarray(fast_out), atol=2e-4, rtol=2e-3
    )


def test_fast_path_bf16_close_to_ref_bf16(rng):
    """In bf16 (the production config) fast and reference paths agree at the
    bf16 rounding floor."""
    kw = dict(SMALL, dtype="bfloat16")
    ref_cfg = EncoderConfig(**kw)
    fast_cfg = EncoderConfig(**kw, fast_ln=True, fast_softmax=True)
    _m, params = init_encoder(ref_cfg, jax.random.PRNGKey(0), example_len=256)
    wav = jnp.asarray(rng.normal(size=(2, 256)).astype(np.float32)) * 0.1
    ref = Emotion2vecEncoder(ref_cfg).apply(params, wav)[0].astype(jnp.float32)
    fast = Emotion2vecEncoder(fast_cfg).apply(params, wav)[0].astype(jnp.float32)
    assert float(jnp.max(jnp.abs(ref - fast))) < 0.15
    # and they correlate near-perfectly
    r = np.corrcoef(np.asarray(ref).ravel(), np.asarray(fast).ravel())[0, 1]
    assert r > 0.999
