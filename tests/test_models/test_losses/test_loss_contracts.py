"""Negative-path loss contracts, mirroring the reference suite.

Reference anchors (NCHW there, NHWC here — pred (N, ..., C), label (N, ...)):
- tests/test_models/test_losses/test_focal_loss.py:10-100
- tests/test_models/test_losses/test_utils.py:35-41,111-129
- tests/test_models/test_losses/test_lovasz_loss.py:10-25
- tests/test_models/test_losses/test_tversky_loss.py:10-18
- tests/test_models/test_losses/test_ce_loss.py:16-22
"""
import jax.numpy as jnp
import numpy as np
import pytest

from stc_unet_tpu.models import build_loss
from stc_unet_tpu.models.losses.accuracy import Accuracy
from stc_unet_tpu.models.losses.utils import weight_reduce_loss


def test_focal_use_sigmoid_contract():
    # can't init with use_sigmoid=False (ref test_focal_loss.py:12)
    with pytest.raises(AssertionError):
        build_loss(dict(type='FocalLoss', use_sigmoid=False))
    # can't forward after flipping use_sigmoid off (ref :17-23)
    loss = build_loss(dict(type='FocalLoss', use_sigmoid=True))
    loss.use_sigmoid = False
    pred = jnp.zeros((3, 5, 6, 4))
    target = jnp.zeros((3, 5, 6), jnp.int32)
    with pytest.raises(NotImplementedError):
        loss(pred, target)


def test_focal_wrong_reduction():
    # init (ref test_focal_loss.py:29)
    with pytest.raises(AssertionError):
        build_loss(dict(type='FocalLoss', reduction='test'))
    # forward override (ref :34-39)
    loss = build_loss(dict(type='FocalLoss'))
    pred = jnp.zeros((3, 5, 6, 4))
    target = jnp.zeros((3, 5, 6), jnp.int32)
    with pytest.raises(AssertionError):
        loss(pred, target, reduction_override='test')


@pytest.mark.parametrize('kw', [
    dict(gamma='test'),          # ref test_focal_loss.py:45-47
    dict(alpha='test'),          # ref :48-50
    dict(class_weight='test'),   # ref :51-53
    dict(loss_weight='test'),    # ref :54-56
    dict(loss_name=123),         # ref :57-59
])
def test_focal_unacceptable_parameters(kw):
    with pytest.raises(AssertionError):
        build_loss(dict(type='FocalLoss', **kw))


def test_focal_shape_mismatch():
    # one-hot target whose spatial dims disagree with pred
    # (ref test_focal_loss.py:93-100)
    loss = build_loss(dict(type='FocalLoss'))
    pred = jnp.zeros((3, 5, 6, 4))
    bad_onehot = jnp.zeros((3, 2, 2, 4))
    with pytest.raises(AssertionError):
        loss(pred, bad_onehot)
    # non-int ignore_index (ref focal_loss.py:230 contract)
    target = jnp.zeros((3, 5, 6), jnp.int32)
    with pytest.raises(AssertionError):
        loss(pred, target, ignore_index='255')


def test_focal_list_alpha_matches_scalar():
    # positive check for the list-alpha path (ref focal_loss.py:106-118):
    # a uniform per-class list must reproduce the scalar-alpha loss exactly.
    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
    target = jnp.asarray(rng.randint(0, 3, (2, 4, 4)), jnp.int32)
    scalar = build_loss(dict(type='FocalLoss', alpha=0.25))
    listy = build_loss(dict(type='FocalLoss', alpha=[0.25, 0.25, 0.25]))
    np.testing.assert_allclose(np.asarray(scalar(pred, target)),
                               np.asarray(listy(pred, target)), rtol=1e-6)


def test_weight_reduce_loss_weight_shape():
    loss = jnp.ones((3, 6, 6, 4))
    weight = jnp.ones((3, 6, 6, 4))
    # ndim mismatch (ref test_utils.py:35-37)
    with pytest.raises(AssertionError):
        weight_reduce_loss(loss, weight=weight[0, ..., 0], reduction='mean')
    # class-axis mismatch that is neither 1 nor C (ref :39-41, axis -1 here)
    with pytest.raises(AssertionError):
        weight_reduce_loss(loss, weight=weight[..., 0:2], reduction='mean')
    # broadcastable class axis of 1 is fine
    weight_reduce_loss(loss, weight=weight[..., 0:1], reduction='mean')


def test_accuracy_contracts():
    pred = jnp.asarray(np.random.rand(5, 4).astype(np.float32))
    true_label = jnp.asarray([0, 1, 2, 3, 2], jnp.int32)
    # topk larger than class count (ref test_utils.py:111-113)
    with pytest.raises(AssertionError):
        Accuracy(topk=5)(pred, true_label)
    # wrong topk type (ref :116-118)
    with pytest.raises(AssertionError):
        Accuracy(topk='wrong type')(pred, true_label)
    # label size mismatch (ref :121-124)
    with pytest.raises(AssertionError):
        Accuracy(topk=1)(pred, jnp.asarray([2, 3, 0, 1, 2, 0], jnp.int32))
    # wrong pred dimension (ref :127-129)
    with pytest.raises(AssertionError):
        Accuracy(topk=1)(pred[:, :, None], true_label)


def test_lovasz_contracts():
    # loss_type must be 'binary'|'multi_class' (ref test_lovasz_loss.py:10)
    with pytest.raises(AssertionError):
        build_loss(dict(type='LovaszLoss', loss_type='Binary',
                        reduction='none'))
    # per_image=False requires reduction='none' (ref :20-25)
    with pytest.raises(AssertionError):
        build_loss(dict(type='LovaszLoss', loss_type='multi_class'))


def test_tversky_alpha_beta_contract():
    # alpha + beta must equal 1 (ref test_tversky_loss.py:10-18)
    with pytest.raises(AssertionError):
        build_loss(dict(type='TverskyLoss', alpha=0.4, beta=0.7))


def test_ce_mask_sigmoid_exclusive():
    # use_mask and use_sigmoid are mutually exclusive (ref test_ce_loss.py:16)
    with pytest.raises(AssertionError):
        build_loss(dict(type='CrossEntropyLoss', use_mask=True,
                        use_sigmoid=True))
