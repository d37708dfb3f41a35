"""Stock UNet block + stage-shape contracts.

Mirrors the reference ``tests/test_models/test_backbones/test_unet.py``
(822 LoC): block-level dcn/plugins rejection, DeconvModule kernel/scale
contract, InterpConv orderings, UpConvBlock upsample variants, and the
full UNet stage-shape matrix across stride/downsample combinations
(NHWC shapes; the reference's NCHW cases transposed).
"""
import jax
import numpy as np
import pytest

from stc_unet_tpu.models.backbones.unet import (BasicConvBlock, DeconvModule,
                                                InterpConv, UNet, UpConvBlock)

DCN = dict(type='DCN', deform_groups=1, fallback_on_stride=False)
PLUGINS = [dict(cfg=dict(type='ContextBlock', ratio=1. / 16),
                position='after_conv3')]


def _run(module, *xs):
    variables = module.init(jax.random.PRNGKey(0), *xs, train=False)
    return module.apply(variables, *xs, train=False)


def _x(*shape):
    return np.random.RandomState(0).rand(*shape).astype(np.float32)


def test_basic_conv_block_contracts():
    with pytest.raises(AssertionError):
        BasicConvBlock(64, dcn=DCN)
    with pytest.raises(AssertionError):
        BasicConvBlock(64, plugins=PLUGINS)

    # identity-resolution forward
    out = _run(BasicConvBlock(16), _x(1, 64, 64, 16))
    assert out.shape == (1, 64, 64, 16)
    # stride-2 downsample
    out = _run(BasicConvBlock(16, stride=2), _x(1, 64, 64, 16))
    assert out.shape == (1, 32, 32, 16)
    # first conv never dilates; later convs dilate with matching padding
    # (reference unet.py:60-78) — resolution must be preserved
    out = _run(BasicConvBlock(64, num_convs=3, dilation=3), _x(1, 32, 32, 16))
    assert out.shape == (1, 32, 32, 64)


def test_deconv_module_contracts():
    # kernel >= scale and (kernel - scale) even (reference unet.py:103-108)
    for k, s in [(1, 2), (3, 2), (5, 4)]:
        with pytest.raises(AssertionError):
            DeconvModule(32, kernel_size=k, scale_factor=s)

    out = _run(DeconvModule(32), _x(1, 32, 32, 64))
    assert out.shape == (1, 64, 64, 32)
    # different kernel sizes, same 2x upsample
    for k in (2, 6):
        out = _run(DeconvModule(32, kernel_size=k, scale_factor=2),
                   _x(1, 16, 16, 64))
        assert out.shape == (1, 32, 32, 32)
    # 4x upsample
    for k in (4, 6):
        out = _run(DeconvModule(32, kernel_size=k, scale_factor=4),
                   _x(1, 16, 16, 64))
        assert out.shape == (1, 64, 64, 32)


def test_interp_conv_variants():
    for kwargs in (
            dict(),
            dict(conv_first=False),
            dict(conv_first=True),
            dict(conv_first=False,
                 upsample_cfg=dict(scale_factor=2, mode='bilinear',
                                   align_corners=False)),
            dict(conv_first=False,
                 upsample_cfg=dict(scale_factor=2, mode='nearest')),
    ):
        out = _run(InterpConv(32, **kwargs), _x(1, 32, 32, 64))
        assert out.shape == (1, 64, 64, 32)


def test_up_conv_block_contracts():
    with pytest.raises(AssertionError):
        UpConvBlock(32, 32, dcn=DCN)
    with pytest.raises(AssertionError):
        UpConvBlock(32, 32, plugins=PLUGINS)

    skip = _x(1, 64, 64, 32)
    x = _x(1, 32, 32, 64)
    # InterpConv upsample (the default in UNet)
    out = _run(UpConvBlock(32, 32, upsample_cfg=dict(type='InterpConv')),
               skip, x)
    assert out.shape == (1, 64, 64, 32)
    # no upsample: skip and x share resolution
    out = _run(UpConvBlock(32, 32, upsample_cfg=None), skip,
               _x(1, 64, 64, 64))
    assert out.shape == (1, 64, 64, 32)
    # explicit bilinear InterpConv
    out = _run(UpConvBlock(
        32, 32, upsample_cfg=dict(
            type='InterpConv',
            upsample_cfg=dict(scale_factor=2, mode='bilinear',
                              align_corners=False))), skip, x)
    assert out.shape == (1, 64, 64, 32)
    # deconv upsample
    out = _run(UpConvBlock(
        32, 32, upsample_cfg=dict(type='DeconvModule', kernel_size=4,
                                  scale_factor=2)), skip, x)
    assert out.shape == (1, 64, 64, 32)
    # dilated 3-conv block variant
    out = _run(UpConvBlock(
        32, 32, num_convs=3, dilation=3,
        upsample_cfg=dict(type='InterpConv')), skip, x)
    assert out.shape == (1, 64, 64, 32)


def _unet(**kwargs):
    base = dict(in_channels=3, base_channels=4, num_stages=5,
                strides=(1, 1, 1, 1, 1), enc_num_convs=(2, 2, 2, 2, 2),
                dec_num_convs=(2, 2, 2, 2),
                downsamples=(True, True, True, True),
                enc_dilations=(1, 1, 1, 1, 1), dec_dilations=(1, 1, 1, 1))
    base.update(kwargs)
    return UNet(**base)


def test_unet_constructor_contracts():
    with pytest.raises(AssertionError):
        UNet(in_channels=3, base_channels=64, num_stages=5, dcn=DCN)
    with pytest.raises(AssertionError):
        UNet(in_channels=3, base_channels=64, num_stages=5, plugins=PLUGINS)
    # per-stage sequence length mismatches
    with pytest.raises(AssertionError):
        _unet(strides=(1, 1, 1, 1))
    with pytest.raises(AssertionError):
        _unet(enc_num_convs=(2, 2, 2, 2))
    with pytest.raises(AssertionError):
        _unet(dec_num_convs=(2, 2, 2, 2, 2))
    with pytest.raises(AssertionError):
        _unet(downsamples=(True, True, True))
    with pytest.raises(AssertionError):
        _unet(enc_dilations=(1, 1, 1, 1))
    with pytest.raises(AssertionError):
        _unet(dec_dilations=(1, 1, 1, 1, 1))


@pytest.mark.parametrize('kwargs, rate', [
    (dict(num_stages=4, strides=(1, 1, 1, 1), enc_num_convs=(2, 2, 2, 2),
          dec_num_convs=(2, 2, 2), downsamples=(True, True, True),
          enc_dilations=(1, 1, 1, 1), dec_dilations=(1, 1, 1)), 8),
    (dict(), 16),
    (dict(downsamples=(True, True, True, False)), 8),
    (dict(strides=(1, 2, 2, 2, 1), downsamples=(True, True, True, False)), 8),
    (dict(num_stages=6, strides=(1,) * 6, enc_num_convs=(2,) * 6,
          dec_num_convs=(2,) * 5, downsamples=(True,) * 5,
          enc_dilations=(1,) * 6, dec_dilations=(1,) * 5), 32),
])
def test_unet_input_divisibility(kwargs, rate):
    """Indivisible inputs are rejected at trace time with the whole
    downsample rate in the message (reference unet.py:341-350)."""
    unet = _unet(**kwargs)
    bad = 65 if rate <= 16 else 65  # 65 is indivisible by every rate here
    with pytest.raises(AssertionError):
        _run(unet, _x(2, bad, bad, 3))
    # the divisible size works
    good = rate * 4
    outs = _run(unet, _x(1, good, good, 3))
    assert outs[-1].shape[1] == good


@pytest.mark.parametrize('kwargs, out_hw', [
    # whole downsample rate 16 (all pool-downsampled)
    (dict(), (8, 8)),
    # rate 8: last stage keeps resolution
    (dict(downsamples=(True, True, True, False)), (16, 16)),
    # rate 8 via stride-2 stages
    (dict(strides=(1, 2, 2, 2, 1), downsamples=(True, True, True, False)),
     (16, 16)),
    # rate 4
    (dict(downsamples=(True, True, False, False)), (32, 32)),
    (dict(strides=(1, 2, 2, 1, 1),
          downsamples=(True, True, False, False)), (32, 32)),
    # rate 2
    (dict(downsamples=(True, False, False, False)), (64, 64)),
    # rate 1
    (dict(downsamples=(False, False, False, False)), (128, 128)),
])
def test_unet_stage_shapes(kwargs, out_hw):
    """Bottom-output resolution tracks the encoder's downsample plan; the
    decoder rebuilds resolution stage by stage (reference test_unet.py
    shape matrix, NHWC)."""
    outs = _run(_unet(**kwargs), _x(2, 128, 128, 3))
    assert len(outs) == 5
    assert outs[0].shape == (2, out_hw[0], out_hw[1], 64)
    # decoder outputs: channels halve, resolution doubles where the
    # matching encoder stage downsampled (never below the bottom res)
    assert outs[-1].shape == (2, 128, 128, 4)
    for o, ch in zip(outs[1:], (32, 16, 8, 4)):
        assert o.shape[-1] == ch


def test_unet_with_cp_flag_accepted():
    outs = _run(_unet(with_cp=True), _x(1, 64, 64, 3))
    assert outs[-1].shape == (1, 64, 64, 4)
