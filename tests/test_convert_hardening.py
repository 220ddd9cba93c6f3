"""Checkpoint-converter hardening against real fairseq state dicts.

Real ``emotion2vec_base.pt`` files carry pretraining-only weights the
features_only path never touches (reference emotion2vec.py:87 `_ema`,
base.py decoder/alibi/mask machinery). The converter must skip exactly
those — and fail loudly on anything else unexpected.
"""

import numpy as np
import pytest
import torch

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
    EncoderConfig,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.convert import (
    fairseq_to_flax_encoder,
)
from torch_mirror import rand_sd

SMALL = EncoderConfig(
    embed_dim=32,
    depth=2,
    num_heads=4,
    prenet_depth=1,
    conv_feature_layers=((16, 4, 2), (16, 3, 2)),
    conv_pos_width=6,
    conv_pos_groups=2,
    conv_pos_depth=2,
)


def distractor_keys(E=32):
    """The dead-weight keys a real emotion2vec_base.pt carries
    (reference emotion2vec.py:87, base.py:74-683)."""
    g = torch.Generator().manual_seed(7)

    def t(*s):
        return torch.randn(*s, generator=g)

    A = "modality_encoders.AUDIO."
    return {
        "_ema": t(4),
        f"{A}decoder.blocks.0.0.weight": t(E, E // 2, 3),
        f"{A}decoder.proj.weight": t(E, E),
        f"{A}decoder.proj.bias": t(E),
        f"{A}alibi_scale": t(1, 1, 12, 1, 1),
        f"{A}mask_emb": t(E),
        "final_proj.weight": t(E, E),
        "final_proj.bias": t(E),
        "recon_proj.weight": t(E, E),
        "num_updates": torch.tensor([100]),
    }


def test_distractor_keys_are_skipped():
    sd = rand_sd(SMALL, seed=0)
    sd.update(distractor_keys())
    clean = fairseq_to_flax_encoder(rand_sd(SMALL, seed=0), SMALL)
    with_distractors = fairseq_to_flax_encoder(sd, SMALL)
    # identical result: distractors provably ignored
    import jax

    same = jax.tree.map(
        lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
        clean, with_distractors,
    )
    assert all(jax.tree.leaves(same))


def test_unknown_key_raises():
    sd = rand_sd(SMALL, seed=0)
    sd["modality_encoders.AUDIO.some_new_submodule.weight"] = torch.randn(8, 8)
    with pytest.raises(ValueError, match="does not recognize"):
        fairseq_to_flax_encoder(sd, SMALL)
    # non-strict mode keeps the permissive behavior
    fairseq_to_flax_encoder(sd, SMALL, strict=False)


def test_wrong_config_shape_raises():
    sd = rand_sd(SMALL, seed=0)
    wrong = EncoderConfig(
        embed_dim=32,
        depth=2,
        num_heads=4,
        prenet_depth=1,
        conv_feature_layers=((24, 4, 2), (16, 3, 2)),  # first conv dim differs
        conv_pos_width=6,
        conv_pos_groups=2,
        conv_pos_depth=2,
    )
    with pytest.raises((ValueError, KeyError)):
        fairseq_to_flax_encoder(sd, wrong)


def test_missing_key_raises():
    sd = rand_sd(SMALL, seed=0)
    del sd["blocks.1.mlp.fc2.bias"]
    with pytest.raises(KeyError):
        fairseq_to_flax_encoder(sd, SMALL)
