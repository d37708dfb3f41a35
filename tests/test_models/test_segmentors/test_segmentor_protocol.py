"""Full segmentor protocol per type (≙ reference
``tests/test_models/test_segmentors/utils.py:81`` —
``_segmentor_forward_train_test`` exercises forward_train, train/val
steps, simple_test and aug_test for every segmentor class).

The TPU-native protocol differs in shape (pure loss fn + functional
train step instead of ``train_step(optimizer)``), so the shared helper
drives: compute_losses(train) → finite; compute_losses(train=False) ≙
val_step; simple_test whole + slide; aug_test over 2 flips; show_result.
"""
import numpy as np
import pytest

from stc_unet_tpu.models import build_segmentor

try:  # jax is always present in this repo's test env
    import jax
except ImportError:  # pragma: no cover
    jax = None

TINY_BACKBONE = dict(type='UnetBackbone', in_channels=3,
                     channel_list=[4, 8, 8, 8])
TINY_HEAD = dict(type='UnetHead', num_classes=2, channels=4,
                 decoder_channel=[16, 16, 16, 16, 4],
                 loss_decode=[
                     dict(type='CrossEntropyLoss', use_sigmoid=False,
                          loss_name='loss_bce', loss_weight=1.0),
                     dict(type='DiceLoss', loss_name='loss_dice',
                          loss_weight=1.0)])


def _cfgs():
    return {
        'EncoderDecoder': dict(
            type='EncoderDecoder', backbone=dict(TINY_BACKBONE),
            decode_head=dict(TINY_HEAD),
            auxiliary_head=dict(type='FCNHead', in_channels=8, channels=4,
                                num_convs=1, num_classes=2, in_index=2),
            test_cfg=dict(mode='whole')),
        'EncoderDecoderFull': dict(
            type='EncoderDecoderFull',
            decode_head=dict(type='DC_Unet', in_channels=3, num_classes=2,
                             channels=8),
            test_cfg=dict(mode='whole')),
        'CascadeEncoderDecoder': dict(
            type='CascadeEncoderDecoder', num_stages=2,
            backbone=dict(TINY_BACKBONE),
            decode_head=[
                dict(TINY_HEAD),
                dict(type='OCRHead', in_channels=4, channels=4,
                     ocr_channels=4, num_classes=2, in_index=-1,
                     input_transform=None)],
            test_cfg=dict(mode='whole')),
    }


def _metas(size, flip=False, direction='horizontal'):
    return [dict(ori_shape=(size, size, 3), img_shape=(size, size, 3),
                 pad_shape=(size, size, 3), scale_factor=1.0, flip=flip,
                 flip_direction=direction)]


@pytest.mark.parametrize('name', sorted(_cfgs()))
def test_segmentor_full_protocol(name):
    size = 32
    cfg = _cfgs()[name]
    model = build_segmentor(cfg)
    model.init_weights(seed=0, input_size=(size, size))
    rng = np.random.RandomState(0)
    img = rng.rand(2, size, size, 3).astype(np.float32)
    gt = rng.randint(0, 2, (2, size, size)).astype(np.int32)

    # train losses (≙ forward_train/train_step loss side)
    losses = model.forward_train(img, None, gt)
    train_keys = {k for k in losses if 'loss' in k}
    assert train_keys, sorted(losses)
    for k in train_keys:
        assert np.isfinite(float(np.asarray(losses[k]).mean())), k
    if name == 'CascadeEncoderDecoder':
        # per-stage prefixes (reference cascade_encoder_decoder.py:52-65)
        assert any(k.startswith('decode_0') for k in losses)
        assert any(k.startswith('decode_1') for k in losses)
    if name == 'EncoderDecoder':
        assert any(k.startswith('aux') for k in losses)

    # val-mode losses (≙ val_step: eval-mode BN, same loss surface)
    val_losses, _ = model.compute_losses(
        model.variables, img, gt, jax.random.PRNGKey(0), train=False)
    assert {k for k in val_losses if 'loss' in k} == train_keys

    # simple_test whole
    preds = model.simple_test(img, _metas(size))
    assert len(preds) == 2 and np.asarray(preds[0]).shape == (size, size)
    assert set(np.unique(np.asarray(preds))) <= {0, 1}

    # simple_test slide (same weights, overlapping grid)
    model.test_cfg = dict(mode='slide', crop_size=(16, 16), stride=(8, 8))
    preds_slide = model.simple_test(img, _metas(size))
    assert np.asarray(preds_slide[0]).shape == (size, size)
    model.test_cfg = dict(mode='whole')

    # aug_test: identity + horizontal flip variants average to the same
    # label map as simple_test on symmetric-logit inputs' shapes
    aug_imgs = [img, img[:, :, ::-1, :].copy()]
    aug_metas = [_metas(size), _metas(size, flip=True)]
    aug_preds = model.aug_test(aug_imgs, aug_metas)
    assert np.asarray(aug_preds[0]).shape == (size, size)

    # show_result overlay
    out = model.show_result(
        (img[0] * 255).astype(np.uint8), [np.asarray(preds[0])],
        palette=[[0, 0, 0], [255, 0, 0]], show=False, opacity=0.5)
    assert out.shape == (size, size, 3)
