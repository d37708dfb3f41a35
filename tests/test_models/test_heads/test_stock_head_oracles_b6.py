"""Torch-oracle goldens, batch 6: LRASPPHead (fixed 49/(16,20) image-pool
gate, bias-free branch convs, conv_up_input, reversed top-down order) and
UPerHead (PPM + FPN top-down fusion and output resize ordering).

Same protocol as batches 1-5.
"""
import importlib.util as _ilu
import os.path as _osp

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

_spec = _ilu.spec_from_file_location(
    'stock_head_oracles_b1',
    _osp.join(_osp.dirname(_osp.abspath(__file__)),
              'test_stock_head_oracles.py'))
_b1 = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_b1)

HEADS, BN, LOSS = _b1.HEADS, _b1.BN, _b1.LOSS
t, cm, conv, _run, _cmp = _b1.t, _b1.cm, _b1.conv, _b1._run, _b1._cmp


def test_lraspp_head_oracle():
    """56x56 deepest level so the reference's fixed AvgPool2d(49, (16, 20))
    window actually applies (1x2 pooled grid)."""
    rng = np.random.RandomState(50)
    xs = [rng.randn(1, 224, 224, 4).astype(np.float32),
          rng.randn(1, 112, 112, 6).astype(np.float32),
          rng.randn(1, 56, 56, 8).astype(np.float32)]
    head = HEADS.get('LRASPPHead')(
        in_channels=[4, 6, 8], channels=6, branch_channels=(3, 5),
        num_classes=3, in_index=(0, 1, 2),
        input_transform='multiple_select', dropout_ratio=0.0, norm_cfg=BN,
        loss_decode=LOSS)
    fv, got = _run(head, [jnp.asarray(x) for x in xs])

    ins = [t(x.transpose(0, 3, 1, 2)) for x in xs]
    x = ins[-1]
    aspp = cm(x, fv, 'aspp_conv')
    pooled = F.avg_pool2d(x, kernel_size=49, stride=(16, 20))
    w = t(fv['params/image_pool_conv/conv/kernel'].transpose(3, 2, 0, 1))
    gate = torch.sigmoid(F.conv2d(pooled, w))
    gate = F.interpolate(gate, size=aspp.shape[2:], mode='bilinear',
                         align_corners=False)
    x = aspp * gate
    x = conv(x, fv, 'conv_up_input')
    for i in range(1, -1, -1):
        x = F.interpolate(x, size=ins[i].shape[2:], mode='bilinear',
                          align_corners=False)
        wb = t(fv[f'params/convs_{i}/conv/kernel'].transpose(3, 2, 0, 1))
        x = torch.cat([x, F.conv2d(ins[i], wb)], 1)
        x = cm(x, fv, f'conv_ups_{i}')
    _cmp(got, conv(x, fv, 'conv_seg'))


def test_uper_head_oracle():
    rng = np.random.RandomState(51)
    xs = [rng.randn(2, 16, 16, 4).astype(np.float32),
          rng.randn(2, 8, 8, 6).astype(np.float32),
          rng.randn(2, 4, 4, 8).astype(np.float32)]
    scales = (1, 2)
    head = HEADS.get('UPerHead')(
        in_channels=[4, 6, 8], channels=6, pool_scales=scales,
        num_classes=3, in_index=(0, 1, 2),
        input_transform='multiple_select', dropout_ratio=0.0, norm_cfg=BN,
        loss_decode=LOSS)
    fv, got = _run(head, [jnp.asarray(x) for x in xs])

    ins = [t(x.transpose(0, 3, 1, 2)) for x in xs]
    x = ins[-1]
    # PPM (reference psp_head.py PPM: adaptive pool → 1x1 ConvModule →
    # upsample to input size)
    psp_outs = [x]
    for i, s in enumerate(scales):
        p = F.adaptive_avg_pool2d(x, s)
        p = cm(p, fv, f'psp_modules/{i}' if
               f'params/psp_modules/{i}/conv_m/conv/kernel' in fv
               else f'psp_modules/convs_{i}')
        psp_outs.append(F.interpolate(p, size=x.shape[2:], mode='bilinear',
                                      align_corners=False))
    psp = cm(torch.cat(psp_outs, dim=1), fv, 'bottleneck', padding=1)

    laterals = [cm(ins[i], fv, f'lateral_convs_{i}') for i in range(2)]
    laterals.append(psp)
    for i in range(2, 0, -1):
        laterals[i - 1] = laterals[i - 1] + F.interpolate(
            laterals[i], size=laterals[i - 1].shape[2:], mode='bilinear',
            align_corners=False)
    fpn_outs = [cm(laterals[i], fv, f'fpn_convs_{i}', padding=1)
                for i in range(2)]
    fpn_outs.append(laterals[-1])
    for i in range(2, 0, -1):
        fpn_outs[i] = F.interpolate(fpn_outs[i], size=fpn_outs[0].shape[2:],
                                    mode='bilinear', align_corners=False)
    out = cm(torch.cat(fpn_outs, dim=1), fv, 'fpn_bottleneck', padding=1)
    _cmp(got, conv(out, fv, 'conv_seg'))
