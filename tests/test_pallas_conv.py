import jax
import jax.numpy as jnp
import numpy as np

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.layers import (
    ConvFeatureExtractor,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.ops.conv import (
    _erf,
    _gelu_erf,
    fused_conv_ln_gelu,
    pallas_conv_stack,
)

SPEC = ((8, 10, 5), (8, 3, 2), (8, 2, 2))


def test_polynomial_erf_accuracy():
    x = jnp.linspace(-4, 4, 1001)
    import scipy.special as sp

    np.testing.assert_allclose(np.asarray(_erf(x)), sp.erf(np.asarray(x)), atol=5e-7)
    np.testing.assert_allclose(
        np.asarray(_gelu_erf(x)),
        np.asarray(jax.nn.gelu(x, approximate=False)),
        atol=1e-6,
    )


def test_fused_conv_stack_matches_flax(rng):
    wav = jnp.asarray(rng.normal(size=(3, 413)) * 0.3, jnp.float32)
    ce = ConvFeatureExtractor(conv_layers=SPEC, dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(0), wav)["params"]
    ref = ce.apply({"params": params}, wav)

    x0 = fused_conv_ln_gelu(
        wav[:, :, None], params["conv_0"]["kernel"], params["ln_0"]["scale"],
        params["ln_0"]["bias"], k=10, s=5, tile=16, interpret=True,
    )
    out = pallas_conv_stack(x0, params, SPEC, tile=16, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-6)


def test_fused_conv_tile_sizes(rng):
    """Output is tile-size invariant (halo DMA correctness)."""
    x = jnp.asarray(rng.normal(size=(2, 97, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 8, 8)) * 0.3, jnp.float32)
    scale = jnp.ones(8)
    bias = jnp.zeros(8)
    outs = [
        np.asarray(fused_conv_ln_gelu(x, w, scale, bias, 3, 2, tile=t, interpret=True))
        for t in (8, 16, 48)
    ]
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-6)


def test_fused_conv_double_buffer_matches_single(rng):
    x = jnp.asarray(rng.normal(size=(3, 97, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 8, 8)) * 0.3, jnp.float32)
    scale = jnp.asarray(rng.normal(size=8) * 0.1 + 1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=8) * 0.1, jnp.float32)
    a = np.asarray(fused_conv_ln_gelu(x, w, scale, bias, 3, 2, tile=16,
                                      interpret=True, double_buffer=False))
    b = np.asarray(fused_conv_ln_gelu(x, w, scale, bias, 3, 2, tile=16,
                                      interpret=True, double_buffer=True))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_fused_conv_multi_batch_matches(rng):
    x = jnp.asarray(rng.normal(size=(6, 97, 8)), jnp.float32)  # 6 % 4 != 0
    w = jnp.asarray(rng.normal(size=(3, 8, 8)) * 0.3, jnp.float32)
    scale = jnp.asarray(rng.normal(size=8) * 0.1 + 1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=8) * 0.1, jnp.float32)
    a = np.asarray(fused_conv_ln_gelu(x, w, scale, bias, 3, 2, tile=16,
                                      interpret=True, double_buffer=False))
    c = np.asarray(fused_conv_ln_gelu(x, w, scale, bias, 3, 2, tile=16,
                                      interpret=True, batch_block=4))
    assert c.shape == a.shape
    np.testing.assert_allclose(a, c, atol=1e-6)
