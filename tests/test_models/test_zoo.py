"""Zoo breadth tests: stock UNet, MobileNetV2, Swin, MiT, ViT backbones;
FPN/MLN/F2P necks; UPer/FPN/Segformer/OCR heads; CascadeEncoderDecoder.
(≙ reference per-component test files under tests/test_models/.)"""
import jax
import numpy as np
import pytest

from stc_unet_tpu.models import (build_backbone, build_head, build_neck,
                                 build_segmentor)


def _run_backbone(cfg, shape=(1, 32, 32, 3)):
    bb = build_backbone(cfg)
    x = np.random.RandomState(0).rand(*shape).astype(np.float32)
    variables = bb.init({'params': jax.random.PRNGKey(0),
                         'dropout': jax.random.PRNGKey(1)}, x)
    return bb.apply(variables, x)


def test_stock_unet_backbone():
    outs = _run_backbone(dict(type='UNet', base_channels=4,
                              norm_cfg=dict(type='BN')), (1, 32, 32, 3))
    # dec_outs: bottom (stride 16) first, finest last
    assert len(outs) == 5
    assert outs[0].shape == (1, 2, 2, 64)
    assert outs[-1].shape == (1, 32, 32, 4)


def test_mobilenet_v2():
    outs = _run_backbone(dict(type='MobileNetV2', widen_factor=1.0,
                              out_indices=(1, 2, 4, 6)), (1, 64, 64, 3))
    assert [o.shape[-1] for o in outs] == [24, 32, 96, 320]
    assert outs[0].shape[1] == 16  # stride 4


def test_swin_backbone():
    outs = _run_backbone(dict(type='SwinTransformer', embed_dims=8,
                              depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                              window_size=4), (1, 32, 32, 3))
    assert [o.shape for o in outs] == [
        (1, 8, 8, 8), (1, 4, 4, 16), (1, 2, 2, 32), (1, 1, 1, 64)]


def test_swin_backbone_nondivisible():
    """Pad-to-window path: 28x28 input with window 4."""
    outs = _run_backbone(dict(type='SwinTransformer', embed_dims=8,
                              depths=(1, 1), num_heads=(1, 2),
                              window_size=4, out_indices=(0, 1)),
                         (1, 28, 28, 3))
    assert outs[0].shape == (1, 7, 7, 8)


def test_mit_backbone():
    outs = _run_backbone(dict(type='MixVisionTransformer', embed_dims=8,
                              num_layers=(1, 1, 1, 1)), (1, 32, 32, 3))
    assert [o.shape[-1] for o in outs] == [8, 16, 32, 64]
    assert outs[0].shape[1] == 8  # stride 4


def test_vit_backbone():
    outs = _run_backbone(dict(type='VisionTransformer', img_size=32,
                              patch_size=8, embed_dims=16, num_layers=2,
                              num_heads=2, out_indices=(0, 1)),
                         (1, 32, 32, 3))
    assert [o.shape for o in outs] == [(1, 4, 4, 16), (1, 4, 4, 16)]


def test_fpn_neck():
    neck = build_neck(dict(type='FPN', in_channels=[4, 8, 16, 32],
                           out_channels=8, num_outs=4))
    ins = [np.random.RandomState(0).rand(1, 2**(4 - i), 2**(4 - i),
                                         c).astype(np.float32)
           for i, c in enumerate([4, 8, 16, 32])]
    variables = neck.init(jax.random.PRNGKey(0), ins)
    outs = neck.apply(variables, ins)
    assert len(outs) == 4
    assert all(o.shape[-1] == 8 for o in outs)


def test_multilevel_neck_and_f2p():
    mln = build_neck(dict(type='MultiLevelNeck', in_channels=[8],
                          out_channels=8, scales=[0.5, 1, 2]))
    x = [np.random.RandomState(0).rand(1, 8, 8, 8).astype(np.float32)]
    v = mln.init(jax.random.PRNGKey(0), x)
    outs = mln.apply(v, x)
    assert [o.shape[1] for o in outs] == [4, 8, 16]

    f2p = build_neck(dict(type='Feature2Pyramid', embed_dim=8,
                          rescales=[4, 2, 1, 0.5]))
    xs = [np.random.RandomState(0).rand(1, 4, 4, 8).astype(np.float32)
          for _ in range(4)]
    v = f2p.init(jax.random.PRNGKey(0), xs)
    outs = f2p.apply(v, xs, train=False)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]


def _run_head(cfg, in_shapes):
    head = build_head(cfg)
    rng = np.random.RandomState(0)
    inputs = [rng.rand(*s).astype(np.float32) for s in in_shapes]
    variables = head.init({'params': jax.random.PRNGKey(0),
                           'dropout': jax.random.PRNGKey(1)}, inputs)
    return head.apply(variables, inputs)


def test_uper_head():
    out = _run_head(dict(type='UPerHead', in_channels=[4, 8, 16, 32],
                         channels=8, num_classes=3,
                         in_index=[0, 1, 2, 3],
                         input_transform='multiple_select',
                         norm_cfg=dict(type='BN'), pool_scales=(1, 2)),
                    [(1, 16, 16, 4), (1, 8, 8, 8), (1, 4, 4, 16),
                     (1, 2, 2, 32)])
    assert out.shape == (1, 16, 16, 3)


def test_fpn_head():
    out = _run_head(dict(type='FPNHead', in_channels=[8, 8, 8, 8],
                         channels=4, num_classes=3,
                         in_index=[0, 1, 2, 3],
                         input_transform='multiple_select',
                         feature_strides=[4, 8, 16, 32],
                         norm_cfg=dict(type='BN')),
                    [(1, 16, 16, 8), (1, 8, 8, 8), (1, 4, 4, 8),
                     (1, 2, 2, 8)])
    assert out.shape == (1, 16, 16, 3)


def test_segformer_head():
    out = _run_head(dict(type='SegformerHead', in_channels=[4, 8, 16, 32],
                         channels=8, num_classes=3,
                         in_index=[0, 1, 2, 3],
                         input_transform='multiple_select',
                         norm_cfg=dict(type='BN')),
                    [(1, 16, 16, 4), (1, 8, 8, 8), (1, 4, 4, 16),
                     (1, 2, 2, 32)])
    assert out.shape == (1, 16, 16, 3)


def test_cascade_encoder_decoder_with_ocr():
    model = build_segmentor(dict(
        type='CascadeEncoderDecoder',
        num_stages=2,
        backbone=dict(type='ResNet', depth=18, base_channels=4,
                      stem_channels=4, out_indices=(0, 1, 2, 3)),
        decode_head=[
            dict(type='FCNHead', in_channels=32, in_index=3, channels=8,
                 num_convs=1, num_classes=2, norm_cfg=dict(type='BN'),
                 concat_input=False,
                 loss_decode=dict(type='CrossEntropyLoss',
                                  loss_weight=0.4)),
            dict(type='OCRHead', in_channels=32, in_index=3, channels=8,
                 ocr_channels=4, num_classes=2, norm_cfg=dict(type='BN'),
                 loss_decode=dict(type='CrossEntropyLoss',
                                  loss_weight=1.0)),
        ],
        test_cfg=dict(mode='whole')))
    model.init_weights(seed=0)
    img = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    metas = [dict(ori_shape=(32, 32, 3), img_shape=(32, 32, 3),
                  pad_shape=(32, 32, 3), scale_factor=1.0, flip=False)]
    gt = np.random.RandomState(1).randint(0, 2, (1, 32, 32))
    losses = model.forward_train(img, metas, gt)
    assert 'decode_0.loss_ce' in losses and 'decode_1.loss_ce' in losses
    preds = model.simple_test(img, metas)
    assert preds[0].shape == (32, 32)


def test_segformer_full_model():
    """MiT-B0-style + SegformerHead end to end."""
    model = build_segmentor(dict(
        type='EncoderDecoder',
        backbone=dict(type='MixVisionTransformer', embed_dims=8,
                      num_layers=(1, 1, 1, 1)),
        decode_head=dict(type='SegformerHead',
                         in_channels=[8, 16, 32, 64], channels=8,
                         in_index=[0, 1, 2, 3],
                         input_transform='multiple_select', num_classes=2,
                         norm_cfg=dict(type='BN'),
                         loss_decode=dict(type='CrossEntropyLoss')),
        test_cfg=dict(mode='whole')))
    model.init_weights(seed=0)
    img = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    metas = [dict(ori_shape=(32, 32, 3), img_shape=(32, 32, 3),
                  pad_shape=(32, 32, 3), scale_factor=1.0, flip=False)]
    preds = model.simple_test(img, metas)
    assert preds[0].shape == (32, 32)


def test_stock_unet_fcn_model():
    """fcn_unet_s5-d16-style model with slide inference (zoo baseline)."""
    model = build_segmentor(dict(
        type='EncoderDecoder',
        backbone=dict(type='UNet', base_channels=4,
                      norm_cfg=dict(type='BN')),
        decode_head=dict(type='FCNHead', in_channels=4, in_index=4,
                         channels=4, num_convs=1, concat_input=False,
                         num_classes=2, norm_cfg=dict(type='BN'),
                         loss_decode=dict(type='CrossEntropyLoss')),
        auxiliary_head=dict(type='FCNHead', in_channels=8, in_index=3,
                            channels=4, num_convs=1, concat_input=False,
                            num_classes=2, norm_cfg=dict(type='BN'),
                            loss_decode=dict(type='CrossEntropyLoss',
                                             loss_weight=0.4)),
        test_cfg=dict(mode='slide', crop_size=(16, 16), stride=(8, 8))))
    model.init_weights(seed=0)
    img = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    metas = [dict(ori_shape=(32, 32, 3), img_shape=(32, 32, 3),
                  pad_shape=(32, 32, 3), scale_factor=1.0, flip=False)]
    gt = np.random.RandomState(1).randint(0, 2, (1, 32, 32))
    losses = model.forward_train(img, metas, gt)
    assert 'decode.loss_ce' in losses and 'aux.loss_ce' in losses
    preds = model.simple_test(img, metas)
    assert preds[0].shape == (32, 32)
