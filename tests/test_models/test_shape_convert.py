"""Shape-convert + embed utils (≙ reference
``tests/test_models/test_utils/test_shape_convert.py`` and
``test_embed.py``, NHWC-native shapes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stc_unet_tpu.models.utils import (AdaptivePadding, PatchEmbed,
                                       PatchMerging, nchw2nlc2nchw,
                                       nchw_to_nlc, nlc2nchw2nlc,
                                       nlc_to_nchw)


def test_nchw_to_nlc():
    # NHWC analog of reference shape (4, 2, 5, 5) ↔ (4, 25, 2)
    x = jnp.zeros((4, 5, 5, 2))
    y = nchw_to_nlc(x)
    assert y.shape == (4, 25, 2)


def test_nlc_to_nchw():
    x = jnp.zeros((4, 25, 2))
    y = nlc_to_nchw(x, (5, 5))
    assert y.shape == (4, 5, 5, 2)
    with pytest.raises(AssertionError):
        nlc_to_nchw(x, (5, 6))


def test_nchw2nlc2nchw():
    shape_nhwc = (4, 5, 5, 2)
    shape_nlc = (4, 25, 2)

    def test_func(x):
        assert x.shape == shape_nlc
        return x

    x = jnp.arange(np.prod(shape_nhwc), dtype=jnp.float32).reshape(shape_nhwc)
    out = nchw2nlc2nchw(test_func, x)
    assert out.shape == shape_nhwc
    np.testing.assert_array_equal(out, x)  # round trip is exact

    def test_func2(x, arg):
        assert x.shape == shape_nlc
        assert arg == 100
        return x

    out = nchw2nlc2nchw(test_func2, x, arg=100)
    assert out.shape == shape_nhwc

    # contiguous flag accepted (no-op: XLA owns layout)
    out = nchw2nlc2nchw(test_func, x, contiguous=True)
    assert out.shape == shape_nhwc

    # channel-changing module reshapes with the new width
    out = nchw2nlc2nchw(lambda t: jnp.concatenate([t, t], -1), x)
    assert out.shape == (4, 5, 5, 4)


def test_nlc2nchw2nlc():
    shape_nhwc = (4, 5, 5, 2)
    shape_nlc = (4, 25, 2)

    def test_func(x):
        assert x.shape == shape_nhwc
        return x

    x = jnp.arange(np.prod(shape_nlc), dtype=jnp.float32).reshape(shape_nlc)
    out = nlc2nchw2nlc(test_func, x, (5, 5))
    assert out.shape == shape_nlc
    np.testing.assert_array_equal(out, x)

    def test_func2(x, arg):
        assert x.shape == shape_nhwc
        assert arg == 100
        return x

    out = nlc2nchw2nlc(test_func2, x, (5, 5), arg=100)
    assert out.shape == shape_nlc

    out = nlc2nchw2nlc(test_func, x, (5, 5), contiguous=True)
    assert out.shape == shape_nlc


def test_adaptive_padding():
    """Reference ``test_embed.py:8-97`` shape cases, NHWC input."""
    for padding in ('same', 'corner'):
        # pad to divisible by 16
        ap = AdaptivePadding(kernel_size=16, stride=16, dilation=1,
                             padding=padding)
        out = ap(jnp.zeros((1, 15, 17, 1)))
        assert out.shape[1:3] == (16, 32)
        out = ap(jnp.zeros((1, 16, 17, 1)))
        assert out.shape[1:3] == (16, 32)

        # pad to divisible by 2
        ap = AdaptivePadding(kernel_size=(2, 2), stride=(2, 2),
                             dilation=(1, 1), padding=padding)
        out = ap(jnp.zeros((1, 11, 13, 1)))
        assert out.shape[1:3] == (12, 14)

        # stride larger than needed → no padding
        ap = AdaptivePadding(kernel_size=(2, 2), stride=(10, 10),
                             dilation=(1, 1), padding=padding)
        out = ap(jnp.zeros((1, 10, 13, 1)))
        assert out.shape[1:3] == (10, 13)

        # kernel covers everything → all padding
        ap = AdaptivePadding(kernel_size=(11, 11), stride=(10, 10),
                             dilation=(1, 1), padding=padding)
        out = ap(jnp.zeros((1, 11, 13, 1)))
        assert out.shape[1:3] == (21, 21)

        # dilation makes the effective kernel (7, 9)
        ap = AdaptivePadding(kernel_size=(4, 5), stride=(3, 4),
                             dilation=(2, 2), padding=padding)
        out = ap(jnp.zeros((1, 11, 13, 1)))
        assert out.shape[1:3] == (16, 21)
        # same shapes as a literal (7, 9) kernel
        ap2 = AdaptivePadding(kernel_size=(7, 9), stride=(3, 4),
                              dilation=(1, 1), padding=padding)
        out2 = ap2(jnp.zeros((1, 11, 13, 1)))
        assert out.shape == out2.shape

    with pytest.raises(AssertionError):
        AdaptivePadding(padding='reflect')

    # 'corner' pads bottom/right only; 'same' splits symmetrically
    x = jnp.ones((1, 3, 3, 1))
    corner = AdaptivePadding(kernel_size=4, stride=4, padding='corner')(x)
    assert float(corner[0, 0, 0, 0]) == 1.0 and float(corner[0, 3, 3, 0]) == 0
    same = AdaptivePadding(kernel_size=5, stride=5, padding='same')(x)
    assert float(same[0, 0, 0, 0]) == 0.0 and float(same[0, 1, 1, 0]) == 1.0


def test_patch_embed():
    """Conv patchify → (B, L, C) tokens (reference ``test_embed.py:100``
    adapted to the swin-core PatchEmbed: square VALID patchify)."""
    pe = PatchEmbed(patch_size=4, embed_dim=10)
    x = jnp.zeros((1, 16, 16, 3))
    var = pe.init(jax.random.PRNGKey(0), x)
    y = pe.apply(var, x)
    assert y.shape == (1, 16, 10)  # (16/4)^2 tokens
    assert 'norm' in var['params']

    y = PatchEmbed(patch_size=4, embed_dim=8, use_norm=False).apply(
        PatchEmbed(patch_size=4, embed_dim=8, use_norm=False).init(
            jax.random.PRNGKey(0), x), x)
    assert y.shape == (1, 16, 8)


def test_patch_merging():
    """2×2 token merge → 2C (reference ``test_embed.py:314`` adapted)."""
    pm = PatchMerging(input_resolution=(4, 4), dim=4)
    x = jnp.arange(1 * 16 * 4, dtype=jnp.float32).reshape(1, 16, 4)
    var = pm.init(jax.random.PRNGKey(0), x)
    y = pm.apply(var, x)
    assert y.shape == (1, 4, 8)  # L/4 tokens, 2C channels
    # reduction is bias-free (reference swinunet_head.py:330)
    assert 'bias' not in var['params']['reduction']
    # odd resolutions are rejected (reference asserts H/W even)
    pm_bad = PatchMerging(input_resolution=(3, 3), dim=4)
    with pytest.raises(AssertionError):
        pm_bad.init(jax.random.PRNGKey(0), jnp.zeros((1, 9, 4)))
