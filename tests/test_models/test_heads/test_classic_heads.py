"""FCN/PSP/ASPP/SepASPP head tests (≙ reference tests/test_models/test_heads)."""
import jax
import numpy as np
import pytest

from stc_unet_tpu.models import build_head, build_segmentor


def _run_head(cfg, in_shapes):
    head = build_head(cfg)
    rng = np.random.RandomState(0)
    inputs = [rng.rand(*s).astype(np.float32) for s in in_shapes]
    variables = head.init({'params': jax.random.PRNGKey(0),
                           'dropout': jax.random.PRNGKey(1)}, inputs)
    return head.apply(variables, inputs)


def test_fcn_head():
    out = _run_head(dict(type='FCNHead', in_channels=8, channels=4,
                         num_classes=3, in_index=-1,
                         norm_cfg=dict(type='BN')),
                    [(1, 8, 8, 8)])
    assert out.shape == (1, 8, 8, 3)


def test_fcn_head_no_concat_num_convs():
    out = _run_head(dict(type='FCNHead', in_channels=8, channels=4,
                         num_classes=3, num_convs=1, concat_input=False),
                    [(1, 8, 8, 8)])
    assert out.shape == (1, 8, 8, 3)


def test_psp_head():
    out = _run_head(dict(type='PSPHead', in_channels=16, channels=8,
                         num_classes=2, pool_scales=(1, 2, 3),
                         norm_cfg=dict(type='BN'), in_index=0),
                    [(1, 12, 12, 16)])
    assert out.shape == (1, 12, 12, 2)


def test_aspp_head():
    out = _run_head(dict(type='ASPPHead', in_channels=16, channels=8,
                         num_classes=2, dilations=(1, 6, 12),
                         norm_cfg=dict(type='BN'), in_index=0),
                    [(1, 16, 16, 16)])
    assert out.shape == (1, 16, 16, 2)


def test_sep_aspp_head_with_c1():
    head_cfg = dict(type='DepthwiseSeparableASPPHead', in_channels=32,
                    channels=8, num_classes=2, dilations=(1, 6),
                    c1_in_channels=8, c1_channels=4,
                    norm_cfg=dict(type='BN'), in_index=-1)
    out = _run_head(head_cfg, [(1, 16, 16, 8), (1, 4, 4, 32)])
    # fused at c1 resolution (16x16)
    assert out.shape == (1, 16, 16, 2)


def test_pspnet_segmentor_tiny():
    """PSPNet-style segmentor builds and runs the full protocol."""
    model = build_segmentor(dict(
        type='EncoderDecoder',
        backbone=dict(type='ResNet', depth=18, out_indices=(0, 1, 2, 3),
                      strides=(1, 2, 1, 1), dilations=(1, 1, 2, 4),
                      base_channels=4, stem_channels=4,
                      contract_dilation=True),
        decode_head=dict(type='PSPHead', in_channels=32, in_index=3,
                         channels=8, pool_scales=(1, 2), num_classes=2,
                         norm_cfg=dict(type='BN'),
                         loss_decode=dict(type='CrossEntropyLoss')),
        test_cfg=dict(mode='whole')))
    model.init_weights(seed=0)
    img = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    metas = [dict(ori_shape=(32, 32, 3), img_shape=(32, 32, 3),
                  pad_shape=(32, 32, 3), scale_factor=1.0, flip=False)]
    losses = model.forward_train(img, metas,
                                 np.zeros((1, 32, 32), np.int32))
    assert np.isfinite(float(losses['decode.loss_ce']))
    preds = model.simple_test(img, metas)
    assert preds[0].shape == (32, 32)


def test_deeplabv3plus_segmentor_tiny():
    model = build_segmentor(dict(
        type='EncoderDecoder',
        backbone=dict(type='ResNet', depth=18, out_indices=(0, 1, 2, 3),
                      strides=(1, 2, 1, 1), dilations=(1, 1, 2, 4),
                      base_channels=4, stem_channels=4,
                      contract_dilation=True),
        decode_head=dict(type='DepthwiseSeparableASPPHead', in_channels=32,
                         in_index=3, channels=8, dilations=(1, 6),
                         c1_in_channels=4, c1_channels=4, num_classes=2,
                         norm_cfg=dict(type='BN'),
                         loss_decode=dict(type='CrossEntropyLoss')),
        test_cfg=dict(mode='whole')))
    model.init_weights(seed=0)
    img = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    metas = [dict(ori_shape=(32, 32, 3), img_shape=(32, 32, 3),
                  pad_shape=(32, 32, 3), scale_factor=1.0, flip=False)]
    preds = model.simple_test(img, metas)
    assert preds[0].shape == (32, 32)
