"""torch→jax converter golden test: a tiny torch STC-UNet fixture (same
module/attribute layout as the reference fork) is converted and must produce
identical logits. This is the checkpoint-parity proof for the flagship family
(BASELINE.md: Dice parity requires bit-faithful weight transfer)."""
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from stc_unet_tpu.models import build_segmentor
from stc_unet_tpu.utils.torch_convert import (convert_state_dict,
                                              convert_torch_checkpoint,
                                              translate_key)

CH = [4, 8, 16, 32]        # tiny channel_list (doubling, like the real one)
DEC = [64, 32, 16, 8, 4]   # tiny decoder_channel


import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.dirname(
    _osp.abspath(__file__)))))
from tests.fixtures.torch_stc_unet import (  # noqa: E402
    _TorchSTCUNet, prefixed_state_dict)

_prefixed_state_dict = prefixed_state_dict


def _prefixed_state_dict(tm):
    sd = {}
    head_names = ('up1', 'up2', 'up3', 'up4', 'conv_seg')
    for k, v in tm.state_dict().items():
        prefix = 'decode_head' if k.startswith(head_names) else 'backbone'
        sd[f'{prefix}.{k}'] = v
    return sd


def _jax_model(stc, ch=None, dec=None):
    ch = CH if ch is None else ch
    dec = DEC if dec is None else dec
    return build_segmentor(dict(
        type='EncoderDecoder',
        backbone=dict(type='UnetBackbone', in_channels=3, channel_list=ch,
                      context_layer='kernelselect' if stc else None,
                      transformer_block=stc),
        decode_head=dict(type='UnetHead', se=stc, num_classes=2,
                         channels=dec[4], decoder_channel=dec,
                         dropout_ratio=0.1,
                         loss_decode=dict(type='CrossEntropyLoss')),
        test_cfg=dict(mode='whole')))


@pytest.mark.parametrize('stc', [False, True])
def test_full_model_parity(stc):
    torch.manual_seed(0)
    tm = _TorchSTCUNet(stc=stc).eval()
    # randomize BN stats so the eval path is non-trivial
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
    x = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        expected = tm(x).numpy()

    model = _jax_model(stc)
    model.init_weights(seed=0)
    variables, _ = convert_torch_checkpoint(
        dict(state_dict=_prefixed_state_dict(tm)), model=model)
    model.variables = variables

    import jax.numpy as jnp
    from stc_unet_tpu.models.segmentors.encoder_decoder import \
        EncoderDecoderNet
    img = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    outs = model.net.apply(variables, img, train=False,
                           method=EncoderDecoderNet.forward_heads)
    got = np.asarray(outs['decode']).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_translate_key_samples():
    assert translate_key('backbone.inc.conv.conv.0.weight') == (
        ('backbone', 'inc', 'conv0', 'conv', 'kernel'), 'conv_w')
    assert translate_key('backbone.down2.down_conv.1.conv.4.running_mean') \
        == (('backbone', 'down2', 'conv', 'bn4', 'mean'), 'bn_stat')
    assert translate_key(
        'backbone.context_layer1_1.fcs.2.bias') == (
        ('backbone', 'context_layer1_1', 'fcs2', 'linear', 'bias'),
        'verbatim')
    assert translate_key('backbone.aspp4.tr.1.ma.in_proj_weight') == (
        ('backbone', 'aspp4', 'tr1', 'ma', 'in_proj_weight'), 'verbatim')
    assert translate_key('decode_head.up1.ca.conv_h.weight') == (
        ('decode_head', 'up1', 'ca', 'conv_h', 'conv', 'kernel'), 'conv_w')
    assert translate_key('decode_head.conv_seg.bias') == (
        ('decode_head', 'conv_seg', 'conv', 'bias'), 'verbatim')
    assert translate_key('backbone.inc.conv.conv.1.num_batches_tracked') \
        is None


@pytest.mark.slow
def test_full_width_model_parity_512():
    """Checkpoint-parity at REAL geometry (my_config/STC-UNet.py:5-20):
    channel_list [64,128,256,512], decoder [1024,512,256,128,64], 512x512
    input — the Dice-parity evidence axis (BASELINE.md) at full width."""
    ch = [64, 128, 256, 512]
    dec = [1024, 512, 256, 128, 64]
    torch.manual_seed(0)
    tm = _TorchSTCUNet(stc=True, ch=ch, dec=dec).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
    x = torch.randn(1, 3, 512, 512)
    with torch.no_grad():
        expected = tm(x).numpy()

    model = _jax_model(True, ch=ch, dec=dec)
    model.init_weights(seed=0, input_size=(64, 64))
    variables, report = convert_torch_checkpoint(
        dict(state_dict=_prefixed_state_dict(tm)), model=model)
    model.variables = variables

    import jax.numpy as jnp
    from stc_unet_tpu.models.segmentors.encoder_decoder import \
        EncoderDecoderNet
    img = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    outs = model.net.apply(variables, img, train=False,
                           method=EncoderDecoderNet.forward_heads)
    got = np.asarray(outs['decode']).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)
