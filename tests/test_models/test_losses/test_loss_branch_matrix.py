"""Loss cfg-branch matrix vs torch/numpy oracles: Dice exponent/smooth/
class_weight, Focal gamma/alpha sweep, Tversky alpha/beta asymmetry,
Lovasz classes= list selection, CE avg_factor override (≙ the reference's
tests/test_models/test_losses per-branch coverage)."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from stc_unet_tpu.models.builder import build_loss


def _data(num_classes=3, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(2, 8, 8, num_classes).astype(np.float32)
    labels = rng.randint(0, num_classes, (2, 8, 8))
    return logits, labels


def _torch_dice(logits, labels, smooth, exponent, num_classes=3):
    """mmseg dice_loss semantics: softmax probs, one-hot, per-class dice
    averaged (background included), mean over batch."""
    pred = torch.softmax(torch.from_numpy(logits), dim=-1)
    oh = F.one_hot(torch.from_numpy(labels).long(), num_classes).float()
    total = 0
    for c in range(num_classes):
        p, t = pred[..., c].reshape(2, -1), oh[..., c].reshape(2, -1)
        num = torch.sum(p * t, dim=1) * 2 + smooth
        den = torch.sum(p.pow(exponent) + t.pow(exponent), dim=1) + smooth
        total = total + (1 - num / den)
    return float((total / num_classes).mean())


@pytest.mark.parametrize('smooth,exponent', [(1, 2), (2, 1), (1e-3, 2)])
def test_dice_branches_vs_oracle(smooth, exponent):
    logits, labels = _data()
    loss = build_loss(dict(type='DiceLoss', smooth=smooth,
                           exponent=exponent, ignore_index=255))
    got = float(loss(jnp.asarray(logits), jnp.asarray(labels)))
    ref = _torch_dice(logits, labels, smooth, exponent)
    np.testing.assert_allclose(got, ref, rtol=1e-4)


@pytest.mark.parametrize('gamma,alpha', [(2.0, 0.5), (1.0, 0.25),
                                         (3.0, 0.75)])
def test_focal_branches_vs_torch(gamma, alpha):
    logits, labels = _data()
    loss = build_loss(dict(type='FocalLoss', gamma=gamma, alpha=alpha))
    got = float(loss(jnp.asarray(logits), jnp.asarray(labels),
                     ignore_index=255))
    # torchvision-style sigmoid focal on one-hot targets, mean over all
    t = F.one_hot(torch.from_numpy(labels).long(), 3).float()
    x = torch.from_numpy(logits)
    p = torch.sigmoid(x)
    ce = F.binary_cross_entropy_with_logits(x, t, reduction='none')
    p_t = p * t + (1 - p) * (1 - t)
    w = alpha * t + (1 - alpha) * (1 - t)
    ref = float((w * ce * ((1 - p_t) ** gamma)).mean())
    np.testing.assert_allclose(got, ref, rtol=1e-3)


@pytest.mark.parametrize('alpha,beta', [(0.3, 0.7), (0.7, 0.3),
                                        (0.5, 0.5)])
def test_tversky_vs_numpy_oracle(alpha, beta):
    """Direct formula oracle: per-class (tp+s)/(tp + a*fp + b*fn + s),
    averaged over classes and batch (mmseg tversky_loss semantics)."""
    logits, labels = _data()
    pred = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    smooth = 1
    total = np.zeros(2)
    for c in range(3):
        p = pred[..., c].reshape(2, -1)
        t = (labels == c).reshape(2, -1).astype(np.float64)
        tp = (p * t).sum(1)
        fp = (p * (1 - t)).sum(1)
        fn = ((1 - p) * t).sum(1)
        total += 1 - (tp + smooth) / (tp + alpha * fp + beta * fn + smooth)
    ref = float((total / 3).mean())
    loss = build_loss(dict(type='TverskyLoss', alpha=alpha, beta=beta))
    got = float(loss(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_lovasz_classes_list_selection():
    logits, labels = _data()
    all_cls = build_loss(dict(type='LovaszLoss', per_image=True,
                              reduction='mean', classes='all'))
    subset = build_loss(dict(type='LovaszLoss', per_image=True,
                             reduction='mean', classes=[1]))
    a = float(all_cls(jnp.asarray(logits), jnp.asarray(labels)))
    b = float(subset(jnp.asarray(logits), jnp.asarray(labels)))
    assert np.isfinite(a) and np.isfinite(b)
    assert abs(a - b) > 1e-6  # class selection must change the value


def test_ce_avg_factor_override():
    logits, labels = _data()
    loss = build_loss(dict(type='CrossEntropyLoss'))
    base = float(loss(jnp.asarray(logits), jnp.asarray(labels)))
    halved = float(loss(jnp.asarray(logits), jnp.asarray(labels),
                        avg_factor=2 * 8 * 8 * 2))
    np.testing.assert_allclose(halved, base / 2, rtol=1e-5)
