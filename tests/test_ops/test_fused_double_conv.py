"""Fused DoubleConv pallas kernel: correctness vs the XLA reference path
(interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from stc_unet_tpu.ops.fused_double_conv import fold_bn, fused_double_conv


def _reference(x, w1, s1, b1, w2, s2, b2):
    y = jax.lax.conv_general_dilated(
        x, w1, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    y = jnp.maximum(y * s1 + b1, 0)
    y = jax.lax.conv_general_dilated(
        y, w2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return jnp.maximum(y * s2 + b2, 0)


def test_fused_double_conv_matches_xla():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    w1 = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(3, 3, 16, 16).astype(np.float32) * 0.1)
    s1 = jnp.asarray(rng.rand(16).astype(np.float32) + 0.5)
    b1 = jnp.asarray(rng.randn(16).astype(np.float32) * 0.1)
    s2 = jnp.asarray(rng.rand(16).astype(np.float32) + 0.5)
    b2 = jnp.asarray(rng.randn(16).astype(np.float32) * 0.1)
    got = fused_double_conv(x, w1, s1, b1, w2, s2, b2, tile_h=8,
                            interpret=True)
    want = _reference(x, w1, s1, b1, w2, s2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fold_bn_matches_batchnorm_eval():
    rng = np.random.RandomState(1)
    c = 8
    x = rng.randn(2, 4, 4, c).astype(np.float32)
    scale = rng.rand(c).astype(np.float32) + 0.5
    bias = rng.randn(c).astype(np.float32)
    mean = rng.randn(c).astype(np.float32)
    var = rng.rand(c).astype(np.float32) + 0.5
    s, b = fold_bn(scale, bias, mean, var)
    got = x * s + b
    want = (x - mean) / np.sqrt(var + 1e-5) * scale + bias
    np.testing.assert_allclose(got, want, rtol=1e-5)
