"""Loss golden tests vs torch oracles (mirrors reference tests/test_losses scope)."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from stc_unet_tpu.models.builder import build_loss
from stc_unet_tpu.models.losses import CrossEntropyLoss, DiceLoss, accuracy


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def _labels(shape, num_classes, seed=1, ignore_frac=0.2, ignore_index=255):
    rng = np.random.RandomState(seed)
    lab = rng.randint(0, num_classes, size=shape)
    mask = rng.rand(*shape) < ignore_frac
    lab[mask] = ignore_index
    return lab.astype(np.int64)


class TestCrossEntropy:
    def test_softmax_ce_mean_over_all(self):
        # mmseg default: ignored pixels contribute 0 but stay in denominator
        logits = _rand((2, 4, 4, 3))
        labels = _labels((2, 4, 4), 3)
        loss = CrossEntropyLoss()(jnp.asarray(logits), jnp.asarray(labels),
                                  ignore_index=255)
        t = F.cross_entropy(torch.from_numpy(logits.transpose(0, 3, 1, 2)),
                            torch.from_numpy(labels), reduction='none',
                            ignore_index=255)
        ref = t.mean().item()
        np.testing.assert_allclose(float(loss), ref, rtol=1e-5)

    def test_softmax_ce_avg_non_ignore(self):
        logits = _rand((2, 4, 4, 3), 2)
        labels = _labels((2, 4, 4), 3, 3)
        loss = CrossEntropyLoss(avg_non_ignore=True)(
            jnp.asarray(logits), jnp.asarray(labels), ignore_index=255)
        ref = F.cross_entropy(torch.from_numpy(logits.transpose(0, 3, 1, 2)),
                              torch.from_numpy(labels),
                              ignore_index=255).item()  # torch averages non-ignored
        np.testing.assert_allclose(float(loss), ref, rtol=1e-5)

    def test_class_weight(self):
        logits = _rand((2, 4, 4, 3), 4)
        labels = _labels((2, 4, 4), 3, 5, ignore_frac=0)
        cw = [0.5, 2.0, 1.5]
        loss = CrossEntropyLoss(class_weight=cw)(
            jnp.asarray(logits), jnp.asarray(labels), ignore_index=255)
        t = F.cross_entropy(torch.from_numpy(logits.transpose(0, 3, 1, 2)),
                            torch.from_numpy(labels),
                            weight=torch.tensor(cw), reduction='none')
        np.testing.assert_allclose(float(loss), t.mean().item(), rtol=1e-5)

    def test_bce_binary_single_channel(self):
        logits = _rand((2, 4, 4, 1), 6)
        labels = _labels((2, 4, 4), 2, 7)
        loss = CrossEntropyLoss(use_sigmoid=True)(
            jnp.asarray(logits), jnp.asarray(labels), ignore_index=255)
        # oracle: BCE-with-logits, valid-mask as weight, mean over ALL
        t_logits = torch.from_numpy(logits[..., 0])
        t_labels = torch.from_numpy(labels)
        valid = ((t_labels >= 0) & (t_labels != 255)).float()
        raw = F.binary_cross_entropy_with_logits(
            t_logits, t_labels.clamp(0, 1).float(), reduction='none')
        ref = (raw * valid).mean().item()
        np.testing.assert_allclose(float(loss), ref, rtol=1e-5)

    def test_bce_multichannel_onehot(self):
        logits = _rand((2, 4, 4, 3), 8)
        labels = _labels((2, 4, 4), 3, 9)
        loss = CrossEntropyLoss(use_sigmoid=True)(
            jnp.asarray(logits), jnp.asarray(labels), ignore_index=255)
        t_logits = torch.from_numpy(logits)
        t_labels = torch.from_numpy(labels)
        valid = ((t_labels >= 0) & (t_labels != 255))
        onehot = F.one_hot(t_labels.clamp(0, 2), 3).float() * valid[..., None]
        raw = F.binary_cross_entropy_with_logits(t_logits, onehot,
                                                 reduction='none')
        ref = (raw * valid[..., None].float()).mean().item()
        np.testing.assert_allclose(float(loss), ref, rtol=1e-5)

    def test_loss_weight_and_name(self):
        l = CrossEntropyLoss(loss_weight=2.0, loss_name='loss_bce')
        assert l.loss_name == 'loss_bce'
        logits = _rand((1, 2, 2, 3), 10)
        labels = _labels((1, 2, 2), 3, 11, ignore_frac=0)
        a = CrossEntropyLoss()(jnp.asarray(logits), jnp.asarray(labels))
        b = l(jnp.asarray(logits), jnp.asarray(labels))
        np.testing.assert_allclose(float(b), 2 * float(a), rtol=1e-6)


class TestDice:
    def test_dice_vs_oracle(self):
        logits = _rand((2, 4, 4, 3), 12)
        labels = _labels((2, 4, 4), 3, 13)
        loss = DiceLoss(ignore_index=255)(jnp.asarray(logits),
                                          jnp.asarray(labels))
        # oracle per reference math: softmax, one-hot(clamped), per-class
        # binary dice with valid mask, /num_classes, mean over batch
        p = torch.softmax(torch.from_numpy(logits), dim=-1)
        lab = torch.from_numpy(labels)
        onehot = F.one_hot(lab.clamp(0, 2), 3).float()
        valid = (lab != 255).float()
        n = p.shape[0]
        total = 0
        for i in range(3):
            pi = p[..., i].reshape(n, -1)
            ti = onehot[..., i].reshape(n, -1)
            v = valid.reshape(n, -1)
            num = (pi * ti * v).sum(1) * 2 + 1
            den = (pi ** 2 + ti ** 2).sum(1) + 1
            total = total + (1 - num / den)
        ref = (total / 3).mean().item()
        np.testing.assert_allclose(float(loss), ref, rtol=1e-5)

    def test_build_from_cfg(self):
        l = build_loss(dict(type='DiceLoss', loss_weight=3.0,
                            loss_name='loss_dice'))
        assert l.loss_name == 'loss_dice' and l.loss_weight == 3.0
        l2 = build_loss(dict(type='CrossEntropyLoss', use_sigmoid=False,
                             loss_name='loss_bce', loss_weight=1.0))
        assert l2.loss_name == 'loss_bce'


class TestAccuracy:
    def test_accuracy_with_ignore(self):
        logits = _rand((2, 4, 4, 3), 14)
        labels = _labels((2, 4, 4), 3, 15)
        acc = accuracy(jnp.asarray(logits), jnp.asarray(labels),
                       ignore_index=255)
        pred = logits.argmax(-1)
        valid = labels != 255
        ref = 100.0 * (pred[valid] == labels[valid]).sum() / max(valid.sum(), 1)
        np.testing.assert_allclose(float(acc), ref, rtol=1e-3)

    def test_accuracy_all_ignored_no_nan(self):
        logits = _rand((1, 2, 2, 3), 16)
        labels = np.full((1, 2, 2), 255, np.int64)
        acc = accuracy(jnp.asarray(logits), jnp.asarray(labels),
                       ignore_index=255)
        assert np.isfinite(float(acc))


def test_losses_jittable():
    import jax
    logits = jnp.asarray(_rand((2, 8, 8, 2), 17))
    labels = jnp.asarray(_labels((2, 8, 8), 2, 18))
    ce = CrossEntropyLoss(loss_name='loss_bce')
    dice = DiceLoss()

    @jax.jit
    def total(lg, lb):
        return ce(lg, lb, ignore_index=255) + dice(lg, lb)

    v = total(logits, labels)
    assert np.isfinite(float(v))
    g = jax.grad(lambda lg: total(lg, labels))(logits)
    assert g.shape == logits.shape and bool(jnp.isfinite(g).all())


def test_mask_cross_entropy_torch_parity():
    """use_mask branch (reference cross_entropy_loss.py:157)."""
    import torch
    import torch.nn.functional as F
    from stc_unet_tpu.models.losses import mask_cross_entropy
    rng = np.random.RandomState(0)
    pred = rng.randn(4, 3).astype(np.float32)
    label = rng.randint(0, 3, (4,))
    target = rng.rand(4).astype(np.float32)
    tp = torch.from_numpy(pred)
    ps = tp[torch.arange(4), torch.from_numpy(label)]
    ref = F.binary_cross_entropy_with_logits(
        ps, torch.from_numpy(target), reduction='mean')[None]
    got = mask_cross_entropy(jnp.asarray(pred), target, label)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5)


def test_cross_entropy_loss_use_mask_dispatch():
    from stc_unet_tpu.models.builder import build_loss
    from stc_unet_tpu.models.losses import mask_cross_entropy
    loss = build_loss(dict(type='CrossEntropyLoss', use_mask=True))
    assert loss.cls_criterion is mask_cross_entropy
