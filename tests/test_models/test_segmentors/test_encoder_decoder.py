"""Segmentor integration tests (≙ reference tests/test_models/test_segmentors).

Tiny shapes/channels keep CPU runs fast, as the reference does with
_demo_mm_inputs (reference tests/test_models/test_segmentors/utils.py:11).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from stc_unet_tpu.models import build_segmentor

TINY_CH = [8, 16, 32, 64]
TINY_DEC = [128, 64, 32, 16, 8]


def _model_cfg(stc=False, out_channels=None, threshold=None, test_cfg=None):
    return dict(
        type='EncoderDecoder',
        backbone=dict(type='UnetBackbone', in_channels=3,
                      channel_list=TINY_CH,
                      context_layer='kernelselect' if stc else None,
                      transformer_block=stc),
        decode_head=dict(type='UnetHead', se=stc, num_classes=2, channels=8,
                         decoder_channel=TINY_DEC,
                         out_channels=out_channels, threshold=threshold,
                         loss_decode=[
                             dict(type='CrossEntropyLoss', use_sigmoid=False,
                                  loss_name='loss_bce', loss_weight=1.0),
                             dict(type='DiceLoss', loss_name='loss_dice',
                                  loss_weight=1.0)]),
        test_cfg=test_cfg or dict(mode='whole'))


def _demo_inputs(n=2, h=32, w=32, num_classes=2, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.rand(n, h, w, 3).astype(np.float32)
    gt = rng.randint(0, num_classes, (n, h, w)).astype(np.int32)
    img_metas = [dict(ori_shape=(h, w, 3), img_shape=(h, w, 3),
                      pad_shape=(h, w, 3), filename=f'{i}.png',
                      scale_factor=1.0, flip=False) for i in range(n)]
    return img, img_metas, gt


def _run_protocol(model, h=32, w=32):
    img, img_metas, gt = _demo_inputs(h=h, w=w)
    model.init_weights(seed=0)
    # forward_train
    losses = model.forward_train(img, img_metas, gt)
    assert 'decode.loss_bce' in losses and 'decode.loss_dice' in losses
    assert 'decode.acc_seg' in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    # train_step / val_step protocol
    out = model.train_step(dict(img=img, img_metas=img_metas,
                                gt_semantic_seg=gt))
    assert 'loss' in out and 'log_vars' in out and out['num_samples'] == 2
    assert np.isfinite(out['log_vars']['loss'])
    # simple_test
    preds = model.simple_test(img, img_metas, rescale=True)
    assert len(preds) == 2 and preds[0].shape == (h, w)
    assert set(np.unique(preds[0])).issubset({0, 1})
    # aug_test (two flips)
    metas_flip = [dict(m, flip=True, flip_direction='horizontal')
                  for m in img_metas]
    preds = model.aug_test([img, img[:, :, ::-1]], [img_metas, metas_flip])
    assert len(preds) == 2 and preds[0].shape == (h, w)
    return model


def test_unet_whole():
    model = build_segmentor(_model_cfg())
    assert model.num_classes == 2 and model.out_channels == 2
    _run_protocol(model)


def test_stc_unet_whole():
    """Full STC config: KSA + transformer + CoordAtt."""
    model = build_segmentor(_model_cfg(stc=True))
    _run_protocol(model)


def test_unet_slide():
    model = build_segmentor(_model_cfg(
        test_cfg=dict(mode='slide', crop_size=(16, 16), stride=(8, 8))))
    img, img_metas, _ = _demo_inputs(h=32, w=32)
    model.init_weights()
    preds = model.simple_test(img, img_metas, rescale=True)
    assert preds[0].shape == (32, 32)
    # slide == whole-ish sanity: all-overlap average is finite & valid labels
    assert set(np.unique(preds[0])).issubset({0, 1})


def test_slide_matches_whole_when_single_tile():
    """crop == image size → slide must equal whole exactly."""
    cfg_w = _model_cfg(test_cfg=dict(mode='whole'))
    cfg_s = _model_cfg(test_cfg=dict(mode='slide', crop_size=(32, 32),
                                     stride=(32, 32)))
    m1 = build_segmentor(cfg_w)
    m1.init_weights(seed=3)
    m2 = build_segmentor(cfg_s)
    m2.variables = m1.variables
    img, img_metas, _ = _demo_inputs(h=32, w=32, seed=5)
    l1 = np.asarray(m1.inference(img, img_metas, rescale=True))
    l2 = np.asarray(m2.inference(img, img_metas, rescale=True))
    np.testing.assert_allclose(l1, l2, rtol=1e-5, atol=1e-6)


def test_binary_out_channels_1_threshold():
    model = build_segmentor(_model_cfg(out_channels=1, threshold=0.4))
    assert model.out_channels == 1
    img, img_metas, gt = _demo_inputs()
    model.init_weights()
    preds = model.simple_test(img, img_metas)
    assert set(np.unique(preds[0])).issubset({0.0, 1.0})


def test_rescale_to_ori_shape():
    model = build_segmentor(_model_cfg())
    model.init_weights()
    img, img_metas, _ = _demo_inputs(h=32, w=32)
    img_metas = [dict(m, ori_shape=(48, 40, 3)) for m in img_metas]
    preds = model.simple_test(img, img_metas, rescale=True)
    assert preds[0].shape == (48, 40)


def test_encoder_decoder_full():
    cfg = dict(
        type='EncoderDecoderFull',
        decode_head=dict(type='UnetHead', num_classes=2, channels=8,
                         decoder_channel=TINY_DEC),
        test_cfg=dict(mode='whole'))
    # UnetHead expects 5 feature levels; Full passes the raw image — use a
    # trivial head instead for the Full-path protocol test
    from stc_unet_tpu.models.builder import HEADS
    from stc_unet_tpu.models.decode_heads import BaseDecodeHead
    import flax.linen as nn

    if 'ExampleFullHead' not in HEADS.module_dict:
        @HEADS.register_module()
        class ExampleFullHead(BaseDecodeHead):
            @nn.compact
            def __call__(self, inputs, train=False):
                return self.cls_seg(inputs, train=train)

    cfg['decode_head'] = dict(type='ExampleFullHead', num_classes=2,
                              channels=8, in_channels=3)
    model = build_segmentor(cfg)
    img, img_metas, gt = _demo_inputs()
    model.init_weights()
    losses = model.forward_train(img, img_metas, gt)
    assert any('loss' in k for k in losses)
    preds = model.simple_test(img, img_metas)
    assert preds[0].shape == (32, 32)


def test_cascade_encoder_decoder_train_loss():
    """CascadeEncoderDecoder forward_train aggregates per-stage decode
    losses with stage prefixes (reference cascade_encoder_decoder.py:76)."""
    cfg = dict(
        type='CascadeEncoderDecoder',
        num_stages=2,
        backbone=dict(type='ResNet', depth=18, out_indices=(0, 1, 2, 3),
                      stem_channels=8, base_channels=8),
        decode_head=[
            dict(type='FCNHead', in_channels=64, in_index=3, channels=8,
                 num_convs=1, concat_input=False, num_classes=3,
                 norm_cfg=dict(type='BN'),
                 loss_decode=dict(type='CrossEntropyLoss')),
            dict(type='OCRHead', in_channels=64, in_index=3, channels=8,
                 ocr_channels=8, num_classes=3, norm_cfg=dict(type='BN'),
                 loss_decode=dict(type='CrossEntropyLoss')),
        ],
        test_cfg=dict(mode='whole'))
    model = build_segmentor(cfg)
    model.init_weights(seed=0, input_size=(32, 32))
    img = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    gt = np.random.RandomState(1).randint(0, 3, (1, 32, 32))
    metas = [dict(ori_shape=(32, 32, 3), img_shape=(32, 32, 3),
                  pad_shape=(32, 32, 3), scale_factor=1.0, flip=False)]
    losses = model.forward_train(img, metas, gt_semantic_seg=gt)
    keys = set(losses)
    assert any('decode_0' in k for k in keys), keys
    assert any('decode_1' in k for k in keys), keys
    total = sum(float(jnp.mean(v)) for k, v in losses.items() if 'loss' in k)
    assert np.isfinite(total)
