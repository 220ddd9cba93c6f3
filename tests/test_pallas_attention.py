import jax
import jax.numpy as jnp
import numpy as np

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.layers import (
    AltAttention,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.ops.attention import (
    flash_attention,
)


def _ref_attention(q, k, v, padding_mask):
    s = np.einsum("bhnd,bhmd->bhnm", q, k).astype(np.float64)
    if padding_mask is not None:
        s = np.where(padding_mask[:, None, None, :], -1e30, s)
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhnm,bhmd->bhnd", p, v)


def test_kernel_matches_reference(rng):
    B, H, N, D = 2, 3, 40, 8  # N not a block multiple -> exercises padding
    q = rng.normal(size=(B, H, N, D)).astype(np.float32) * 0.3
    k = rng.normal(size=(B, H, N, D)).astype(np.float32) * 0.3
    v = rng.normal(size=(B, H, N, D)).astype(np.float32)
    mask = np.zeros((B, N), bool)
    mask[0, 25:] = True
    out = np.asarray(
        flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        jnp.asarray(mask), block_q=16)
    )
    ref = _ref_attention(q, k, v, mask)
    # compare only valid query rows (padded-query rows attend to junk)
    np.testing.assert_allclose(out[0, :, :25], ref[0, :, :25], atol=2e-5)
    np.testing.assert_allclose(out[1], ref[1], atol=2e-5)


def test_kernel_no_mask(rng):
    B, H, N, D = 1, 2, 32, 8
    q = rng.normal(size=(B, H, N, D)).astype(np.float32) * 0.3
    k = rng.normal(size=(B, H, N, D)).astype(np.float32) * 0.3
    v = rng.normal(size=(B, H, N, D)).astype(np.float32)
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), block_q=32))
    ref = _ref_attention(q, k, v, None)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_altattention_flash_equals_einsum(rng):
    x = rng.normal(size=(2, 20, 16)).astype(np.float32)
    mask = np.zeros((2, 20), bool)
    mask[1, 12:] = True
    attn_x = AltAttention(dim=16, num_heads=2, dtype=jnp.float32, use_flash=False)
    params = attn_x.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))
    out_x = attn_x.apply(params, jnp.asarray(x), jnp.asarray(mask))
    attn_f = AltAttention(dim=16, num_heads=2, dtype=jnp.float32, use_flash=True)
    out_f = attn_f.apply(params, jnp.asarray(x), jnp.asarray(mask))
    # compare valid rows only
    np.testing.assert_allclose(np.asarray(out_x)[0], np.asarray(out_f)[0], atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(out_x)[1, :12], np.asarray(out_f)[1, :12], atol=3e-5
    )


def test_altattention_auto_routes_by_length(rng):
    """use_flash="auto" (round 5): XLA path below FLASH_AUTO_MIN_FRAMES
    (bit-identical to use_flash=False), Pallas kernel at/above it
    (numerically equal). N is static under jit, so each length bucket
    routes independently."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.layers import (
        FLASH_AUTO_MIN_FRAMES,
    )

    assert FLASH_AUTO_MIN_FRAMES == 512  # documented crossover
    for n, expect_flash in ((24, False), (520, True)):
        x = rng.normal(size=(1, n, 16)).astype(np.float32)
        mask = np.zeros((1, n), bool)
        mask[0, n - 3:] = True
        kw = dict(dim=16, num_heads=2, dtype=jnp.float32)
        ref = AltAttention(use_flash=False, **kw)
        params = ref.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(mask))
        out_ref = np.asarray(ref.apply(params, jnp.asarray(x), jnp.asarray(mask)))
        auto = AltAttention(use_flash="auto", **kw)
        out_auto = np.asarray(auto.apply(params, jnp.asarray(x), jnp.asarray(mask)))
        if expect_flash:
            # kernel numerics: equal within f32 softmax tolerance
            np.testing.assert_allclose(out_auto[:, : n - 3], out_ref[:, : n - 3],
                                       atol=3e-5)
        else:
            # below the crossover auto IS the XLA path
            np.testing.assert_array_equal(out_auto, out_ref)
