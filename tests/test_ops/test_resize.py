"""Golden parity tests: our resize vs torch F.interpolate (CPU oracle).

The reference's entire inference/loss path flows through F.interpolate
(reference mmseg/ops/wrappers.py:8); exact sampling-rule parity here is a
precondition for checkpoint-level Dice parity.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from stc_unet_tpu.ops import resize

SHAPES = [
    ((2, 8, 8, 3), (16, 16)),    # 2x up
    ((1, 16, 16, 4), (8, 8)),    # 2x down
    ((1, 7, 5, 2), (13, 11)),    # odd up
    ((1, 13, 11, 2), (7, 5)),    # odd down
    ((1, 4, 4, 1), (4, 4)),      # identity
    ((2, 32, 32, 2), (600, 600)),  # the reference Resize(600,600) path
    ((1, 5, 5, 1), (1, 1)),      # degenerate
]


def _oracle(x_nhwc, size, mode, align_corners):
    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    kwargs = {} if mode == 'nearest' else {'align_corners': align_corners}
    out = F.interpolate(t, size=size, mode=mode, **kwargs)
    return np.transpose(out.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize('shape,size', SHAPES)
@pytest.mark.parametrize('align', [True, False])
def test_bilinear_parity(shape, size, align):
    rng = np.random.RandomState(0)
    x = rng.randn(*shape).astype(np.float32)
    ours = np.asarray(resize(x, size=size, mode='bilinear',
                             align_corners=align, warning=False))
    ref = _oracle(x, size, 'bilinear', align)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('shape,size', SHAPES)
def test_nearest_parity(shape, size):
    rng = np.random.RandomState(1)
    x = rng.randn(*shape).astype(np.float32)
    ours = np.asarray(resize(x, size=size, mode='nearest'))
    ref = _oracle(x, size, 'nearest', None)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=0)


def test_scale_factor():
    x = np.random.RandomState(2).randn(1, 6, 6, 2).astype(np.float32)
    ours = np.asarray(resize(x, scale_factor=2, mode='bilinear',
                             align_corners=True))
    ref = _oracle(x, (12, 12), 'bilinear', True)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_jit_and_grad():
    import jax
    import jax.numpy as jnp
    x = jnp.ones((1, 4, 4, 1))
    f = jax.jit(lambda a: resize(a, size=(8, 8), mode='bilinear',
                                 align_corners=True).sum())
    g = jax.grad(f)(x)
    assert g.shape == x.shape
    # total gradient mass == number of output pixels (linear op, weights sum 1)
    np.testing.assert_allclose(float(g.sum()), 64.0, rtol=1e-5)


def test_errors():
    x = np.zeros((1, 4, 4, 1), np.float32)
    with pytest.raises(ValueError):
        resize(x, size=(2, 2), mode='nearest', align_corners=True)
    with pytest.raises(ValueError):
        resize(x)
    with pytest.raises(ValueError):
        resize(np.zeros((4, 4), np.float32), size=(2, 2))


@pytest.mark.parametrize('ac', [False, True])
@pytest.mark.parametrize('size', [(14, 18), (5, 4), (13, 11)])
def test_bicubic_torch_parity(ac, size):
    """Bicubic (Keys a=-0.75, border-replicated) vs F.interpolate — the
    ViT pos-embed adaptation mode (reference vit.py interpolate_mode)."""
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(0)
    x = rng.rand(2, 7, 9, 3).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                        size=size, mode='bicubic', align_corners=ac)
    import jax.numpy as jnp
    got = resize(jnp.asarray(x), size=size, mode='bicubic',
                 align_corners=ac, warning=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               ref.numpy(), rtol=1e-4, atol=1e-5)
