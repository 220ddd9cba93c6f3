"""Optional encoder branches (reference-dead with the shipped config, ported
for config-completeness): cosine attention, alibi bias, layerdrop."""

import math

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
    EncoderConfig,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.emotion2vec import (
    Emotion2vecEncoder,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.layers import (
    AltAttention,
    alibi_bias,
    alibi_slopes,
)

TINY = dict(
    embed_dim=16,
    depth=2,
    num_heads=2,
    prenet_depth=1,
    conv_feature_layers=((8, 4, 2), (8, 3, 2)),
    conv_pos_depth=2,
    conv_pos_width=10,
    conv_pos_groups=2,
    dtype="float32",
)


# ---------------------------------------------------------------------------
# cosine attention vs torch oracle (reference modules.py:274-300)
# ---------------------------------------------------------------------------
class TorchCosineAttention(torch.nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.qkv = torch.nn.Linear(dim, dim * 3, bias=True)
        self.proj = torch.nn.Linear(dim, dim)
        self.logit_scale = torch.nn.Parameter(
            torch.log(10 * torch.ones((num_heads, 1, 1)))
        )

    def forward(self, x, padding_mask=None):
        B, N, C = x.shape
        qkv = (
            self.qkv(x)
            .reshape(B, N, 3, self.num_heads, C // self.num_heads)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = F.normalize(q, dim=-1) @ F.normalize(k, dim=-1).transpose(-2, -1)
        logit_scale = torch.clamp(
            self.logit_scale, max=torch.log(torch.tensor(1.0 / 0.01))
        ).exp()
        attn = attn * logit_scale
        if padding_mask is not None and padding_mask.any():
            attn = attn.masked_fill(
                padding_mask.unsqueeze(1).unsqueeze(2).to(torch.bool),
                float("-inf"),
            )
        attn = attn.softmax(dim=-1, dtype=torch.float32)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


def test_cosine_attention_matches_torch(rng):
    D, H = 12, 3
    x = rng.normal(size=(2, 7, D)).astype(np.float32)
    pad = np.zeros((2, 7), bool)
    pad[1, 5:] = True

    attn = AltAttention(dim=D, num_heads=H, cosine_attention=True)
    params = attn.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(pad))
    # perturb the logit scale away from init to exercise the clamp path
    p = jax.tree.map(np.asarray, params)["params"]
    p["logit_scale"] = p["logit_scale"] + np.array([[[3.0]], [[0.0]], [[-1.0]]],
                                                   np.float32)
    params = {"params": p}

    t = TorchCosineAttention(D, H)
    with torch.no_grad():
        t.qkv.weight.copy_(torch.from_numpy(np.asarray(p["qkv"]["kernel"]).T))
        t.qkv.bias.copy_(torch.from_numpy(np.asarray(p["qkv"]["bias"])))
        t.proj.weight.copy_(torch.from_numpy(np.asarray(p["proj"]["kernel"]).T))
        t.proj.bias.copy_(torch.from_numpy(np.asarray(p["proj"]["bias"])))
        t.logit_scale.copy_(torch.from_numpy(p["logit_scale"]))
        want = t(torch.from_numpy(x), torch.from_numpy(pad)).numpy()
    got = np.asarray(attn.apply(params, jnp.asarray(x), jnp.asarray(pad)))
    # padded columns produce arbitrary values in torch (softmax over -inf of
    # a padded ROW is fine since query rows aren't masked); compare valid rows
    np.testing.assert_allclose(got[0], want[0], atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(got[1, :5], want[1, :5], atol=2e-5, rtol=2e-5)


# ---------------------------------------------------------------------------
# alibi (reference base.py:538-642)
# ---------------------------------------------------------------------------
def reference_slopes(n):
    """Verbatim logic of base.py:544-561 as an oracle."""

    def get_slopes_power_of_2(n):
        start = 2 ** (-(2 ** -(math.log2(n) - 3)))
        ratio = start
        return [start * ratio**i for i in range(n)]

    if math.log2(n).is_integer():
        return get_slopes_power_of_2(n)
    closest = 2 ** math.floor(math.log2(n))
    return (
        get_slopes_power_of_2(closest)
        + reference_slopes(2 * closest)[0::2][: n - closest]
    )


def test_alibi_slopes_match_reference():
    for h in [1, 2, 4, 8, 12, 16]:
        np.testing.assert_allclose(alibi_slopes(h), reference_slopes(h),
                                   rtol=1e-12)


def test_alibi_bias_structure():
    b = np.asarray(alibi_bias(6, 4, scale=2.0))
    assert b.shape == (1, 4, 6, 6)
    # zero diagonal, symmetric, linearly decreasing
    for h in range(4):
        np.testing.assert_allclose(np.diag(b[0, h]), 0.0)
        np.testing.assert_allclose(b[0, h], b[0, h].T)
        np.testing.assert_allclose(
            b[0, h, 0, 3], -3 * 2.0 * reference_slopes(4)[h], rtol=1e-6
        )


def test_encoder_with_alibi_runs_and_differs(rng):
    wav = jnp.asarray(rng.normal(size=(2, 64)).astype(np.float32))
    base = Emotion2vecEncoder(EncoderConfig(**TINY))
    params = base.init(jax.random.PRNGKey(0), wav)
    out0, _ = base.apply(params, wav)
    ali = Emotion2vecEncoder(EncoderConfig(**TINY, use_alibi_encoder=True))
    out1, _ = ali.apply(params, wav)  # same params: alibi is parameter-free
    assert out0.shape == out1.shape
    assert np.abs(np.asarray(out0) - np.asarray(out1)).max() > 1e-4


# ---------------------------------------------------------------------------
# layerdrop (reference modules.py:78-92)
# ---------------------------------------------------------------------------
def test_layerdrop_inactive_at_inference(rng):
    wav = jnp.asarray(rng.normal(size=(2, 64)).astype(np.float32))
    enc0 = Emotion2vecEncoder(EncoderConfig(**TINY))
    params = enc0.init(jax.random.PRNGKey(0), wav)
    enc_ld = Emotion2vecEncoder(EncoderConfig(**TINY, layerdrop=0.5))
    a, _ = enc0.apply(params, wav, deterministic=True)
    b, _ = enc_ld.apply(params, wav, deterministic=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_layerdrop_one_skips_all_main_blocks(rng):
    """layerdrop=1.0 must reduce the main stack to the identity: the output
    equals a depth-0 forward."""
    wav = jnp.asarray(rng.normal(size=(1, 64)).astype(np.float32))
    enc = Emotion2vecEncoder(EncoderConfig(**TINY, layerdrop=1.0))
    params = enc.init(jax.random.PRNGKey(0), wav)
    full, _ = enc.apply(
        params, wav, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    # reference path: run the same params with all main blocks manually
    # disabled by comparing against deterministic prenet-only output. The
    # encoder has its own dropout layers, so set all dropout rates to 0 to
    # isolate layerdrop.
    cfg_nodrop = EncoderConfig(
        **{**TINY, "encoder_dropout": 0.0, "attention_dropout": 0.0,
           "post_mlp_drop": 0.0}, layerdrop=1.0,
    )
    enc_nd = Emotion2vecEncoder(cfg_nodrop)
    out_ld, _ = enc_nd.apply(
        params, wav, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    cfg_d0 = EncoderConfig(
        **{**TINY, "depth": 0, "encoder_dropout": 0.0,
           "attention_dropout": 0.0, "post_mlp_drop": 0.0},
    )
    enc_d0 = Emotion2vecEncoder(cfg_d0)
    p0 = {"params": {k: v for k, v in params["params"].items()
                     if not k.startswith("block_")}}
    out_d0, _ = enc_d0.apply(p0, wav, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_ld), np.asarray(out_d0), atol=1e-5, rtol=1e-5
    )
