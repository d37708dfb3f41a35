"""Torch-oracle forward goldens for ALL six necks (reference
``necks/fpn.py``, ``jpu.py``, ``ic_neck.py``, ``mla_neck.py``,
``multilevel_neck.py``, ``featurepyramid.py``).

Protocol (as the stock-head oracle campaign): build the flax neck,
randomize every leaf deterministically, re-run the reference math in plain
torch on the SAME weights, require parity at rtol 1e-4. These caught the
MLANeck reversed-aggregation bug, the ICNeck missing-ReLU/aux-source bugs
and the JPU start/end-level slicing bug.
"""
import importlib.util as _ilu
import os.path as _osp

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

_spec = _ilu.spec_from_file_location(
    'stock_head_oracles_for_necks',
    _osp.join(_osp.dirname(_osp.abspath(__file__)),
              'test_heads', 'test_stock_head_oracles.py'))
_b1 = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_b1)

t, bn, _randomize, _flat = _b1.t, _b1.bn, _b1._randomize, _b1._flat

BN = dict(type='BN')
RELU = dict(type='ReLU')


def _cm(x, fv, name, k=3, stride=1, padding=0, dilation=1, groups=1,
        norm=True, act=True):
    """ConvModule oracle: conv (+BN eval) (+ReLU), arbitrary geometry."""
    w = t(fv[f'params/{name}/conv_m/conv/kernel'].transpose(3, 2, 0, 1))
    b = fv.get(f'params/{name}/conv_m/conv/bias')
    x = F.conv2d(x, w, t(b) if b is not None else None, stride=stride,
                 padding=padding, dilation=dilation, groups=groups)
    if norm:
        x = bn(x, fv, f'{name}/bn')
    return F.relu(x) if act else x


def _init_run(neck, inputs_nhwc, seed=0):
    rngs = {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)}
    xs = [jnp.asarray(a) for a in inputs_nhwc]
    variables = neck.init(rngs, xs, train=False)
    variables = _randomize(variables, seed)
    outs = neck.apply(variables, xs, train=False)
    return _flat(variables), [np.asarray(o, np.float32) for o in outs]


def _cmp_list(got_nhwc_list, exp_nchw_list, rtol=1e-4, atol=1e-4):
    assert len(got_nhwc_list) == len(exp_nchw_list)
    for g, e in zip(got_nhwc_list, exp_nchw_list):
        np.testing.assert_allclose(g.transpose(0, 3, 1, 2), e.numpy(),
                                   rtol=rtol, atol=atol)


# ---------------------------------------------------------------------------
# FPN (reference fpn.py:163-213) — extra convs on_input + relu chain
# ---------------------------------------------------------------------------
def test_fpn_oracle_extra_on_input():
    from stc_unet_tpu.models.builder import NECKS
    rng = np.random.RandomState(11)
    ins = [rng.randn(1, 32 // 2**i, 32 // 2**i, c).astype(np.float32)
           for i, c in enumerate((8, 16, 32))]
    neck = NECKS.get('FPN')(
        in_channels=[8, 16, 32], out_channels=16, num_outs=5,
        add_extra_convs='on_input', relu_before_extra_convs=True,
        norm_cfg=BN, act_cfg=None)
    fv, got = _init_run(neck, ins)

    tx = [t(a.transpose(0, 3, 1, 2)) for a in ins]
    lat = [_cm(tx[i], fv, f'lateral_convs_{i}', k=1, act=False)
           for i in range(3)]
    for i in (2, 1):
        lat[i - 1] = lat[i - 1] + F.interpolate(
            lat[i], size=lat[i - 1].shape[2:], mode='nearest')
    outs = [_cm(lat[i], fv, f'fpn_convs_{i}', padding=1, act=False)
            for i in range(3)]
    outs.append(_cm(tx[2], fv, 'extra_convs_0', stride=2, padding=1,
                    act=False))
    outs.append(_cm(F.relu(outs[-1]), fv, 'extra_convs_1', stride=2,
                    padding=1, act=False))
    _cmp_list(got, outs)


def test_fpn_oracle_maxpool_extras():
    from stc_unet_tpu.models.builder import NECKS
    rng = np.random.RandomState(12)
    ins = [rng.randn(1, 16 // 2**i, 16 // 2**i, c).astype(np.float32)
           for i, c in enumerate((8, 16))]
    neck = NECKS.get('FPN')(in_channels=[8, 16], out_channels=8, num_outs=3)
    fv, got = _init_run(neck, ins)

    tx = [t(a.transpose(0, 3, 1, 2)) for a in ins]
    lat = [_cm(tx[i], fv, f'lateral_convs_{i}', k=1, norm=False, act=False)
           for i in range(2)]
    lat[0] = lat[0] + F.interpolate(lat[1], size=lat[0].shape[2:],
                                    mode='nearest')
    outs = [_cm(lat[i], fv, f'fpn_convs_{i}', padding=1, norm=False,
                act=False) for i in range(2)]
    outs.append(F.max_pool2d(outs[-1], 1, stride=2))
    _cmp_list(got, outs)


# ---------------------------------------------------------------------------
# JPU (reference jpu.py:99-131)
# ---------------------------------------------------------------------------
def test_jpu_oracle():
    from stc_unet_tpu.models.builder import NECKS
    rng = np.random.RandomState(13)
    sizes = (32, 16, 8)
    chans = (8, 16, 32)
    ins = [rng.randn(1, s, s, c).astype(np.float32)
           for s, c in zip(sizes, chans)]
    neck = NECKS.get('JPU')(in_channels=chans, mid_channels=16,
                            dilations=(1, 2, 4, 8), norm_cfg=BN)
    fv, got = _init_run(neck, ins)

    tx = [t(a.transpose(0, 3, 1, 2)) for a in ins]
    feats = [_cm(tx[i], fv, f'conv_{i}', padding=1) for i in range(3)]
    h, w = feats[0].shape[2:]
    for i in (1, 2):
        feats[i] = F.interpolate(feats[i], size=(h, w), mode='bilinear',
                                 align_corners=False)
    feat = torch.cat(feats, 1)
    dil_outs = []
    for i, d in enumerate((1, 2, 4, 8)):
        y = _cm(feat, fv, f'dilation_{i}/depthwise_conv', padding=d,
                dilation=d, groups=feat.shape[1], act=False)
        y = _cm(y, fv, f'dilation_{i}/pointwise_conv', k=1)
        dil_outs.append(y)
    concat = torch.cat(dil_outs, 1)
    _cmp_list(got, [tx[0], tx[1], concat])


# ---------------------------------------------------------------------------
# ICNeck (reference ic_neck.py:64-77,139-148) — CFF act + aux source
# ---------------------------------------------------------------------------
def test_ic_neck_oracle():
    from stc_unet_tpu.models.builder import NECKS
    rng = np.random.RandomState(14)
    s1 = rng.randn(1, 32, 32, 8).astype(np.float32)
    s2 = rng.randn(1, 16, 16, 16).astype(np.float32)
    s4 = rng.randn(1, 8, 8, 16).astype(np.float32)
    neck = NECKS.get('ICNeck')(in_channels=(8, 16, 16), out_channels=12,
                               norm_cfg=BN)
    fv, got = _init_run(neck, [s1, s2, s4])

    def cff(low, high, p):
        low = F.interpolate(low, size=high.shape[2:], mode='bilinear',
                            align_corners=False)
        low_f = _cm(low, fv, f'{p}/conv_low', padding=2, dilation=2)
        high_f = _cm(high, fv, f'{p}/conv_high', k=1)
        return F.relu(low_f + high_f), low_f

    tx = [t(a.transpose(0, 3, 1, 2)) for a in (s1, s2, s4)]
    x_cff_24, x_24 = cff(tx[2], tx[1], 'cff_24')
    x_cff_12, x_12 = cff(x_cff_24, tx[0], 'cff_12')
    _cmp_list(got, [x_24, x_12, x_cff_12])


# ---------------------------------------------------------------------------
# MLANeck (reference mla_neck.py:36-59,104-118) — top-first aggregation
# ---------------------------------------------------------------------------
def test_mla_neck_oracle():
    from stc_unet_tpu.models.builder import NECKS
    rng = np.random.RandomState(15)
    ins = [rng.randn(1, 8, 8, 8).astype(np.float32) for _ in range(4)]
    neck = NECKS.get('MLANeck')(in_channels=[8, 8, 8, 8], out_channels=8,
                                norm_cfg=BN, act_cfg=RELU)
    fv, got = _init_run(neck, ins)

    feats = []
    for i, a in enumerate(ins):
        x = t(a.transpose(0, 3, 1, 2))
        n, c, h, w = x.shape
        x = x.reshape(n, c, h * w).transpose(2, 1)
        x = F.layer_norm(x, (c,), t(fv[f'params/norm_{i}/scale']),
                         t(fv[f'params/norm_{i}/bias']), eps=1e-6)
        x = x.transpose(1, 2).reshape(n, c, h, w)
        feats.append(_cm(x, fv, f'mla_convs1_{i}', k=1))
    # reference order: reverse to [p5..p2], cumulative sums, convs applied
    # top-first and returned top-first
    mids = []
    for f in feats[::-1]:
        mids.append(f if not mids else mids[-1] + f)
    outs = [_cm(m, fv, f'mla_convs2_{i}', padding=1)
            for i, m in enumerate(mids)]
    _cmp_list(got, outs)


# ---------------------------------------------------------------------------
# MultiLevelNeck (reference multilevel_neck.py:64-78)
# ---------------------------------------------------------------------------
def test_multilevel_neck_oracle():
    from stc_unet_tpu.models.builder import NECKS
    rng = np.random.RandomState(16)
    ins = [rng.randn(1, 16, 16, 8).astype(np.float32)]
    neck = NECKS.get('MultiLevelNeck')(in_channels=[8], out_channels=8,
                                       scales=[4, 2, 1, 0.5])
    fv, got = _init_run(neck, ins)

    x = t(ins[0].transpose(0, 3, 1, 2))
    lat = _cm(x, fv, 'lateral_convs_0', k=1, norm=False, act=False)
    outs = []
    for i, s in enumerate((4, 2, 1, 0.5)):
        y = lat if s == 1 else F.interpolate(
            lat, scale_factor=s, mode='bilinear', align_corners=False)
        outs.append(_cm(y, fv, f'convs_{i}', padding=1, norm=False,
                        act=False))
    _cmp_list(got, outs)


# ---------------------------------------------------------------------------
# Feature2Pyramid (reference featurepyramid.py:26-67) — deconv orientation
# ---------------------------------------------------------------------------
def _deconv(x, fv, name):
    """flax ConvTranspose kernel (kh,kw,I,O) ≙ torch weight (I,O,kh,kw)
    spatially FLIPPED (torch's op is the conv gradient; flax's is not)."""
    k = fv[f'params/{name}/kernel']
    w = t(np.flip(k, (0, 1)).transpose(2, 3, 0, 1).copy())
    b = fv.get(f'params/{name}/bias')
    return F.conv_transpose2d(x, w, t(b) if b is not None else None, stride=2)


def test_feature2pyramid_oracle():
    from stc_unet_tpu.models.builder import NECKS
    rng = np.random.RandomState(17)
    ins = [rng.randn(1, 8, 8, 8).astype(np.float32) for _ in range(4)]
    neck = NECKS.get('Feature2Pyramid')(embed_dim=8,
                                        rescales=[4, 2, 1, 0.5])
    fv, got = _init_run(neck, ins)

    tx = [t(a.transpose(0, 3, 1, 2)) for a in ins]
    y0 = _deconv(tx[0], fv, 'up4_deconv1_0')
    y0 = bn(y0, fv, 'up4_bn_0')
    y0 = F.gelu(y0)                      # exact erf, as nn.GELU()
    y0 = _deconv(y0, fv, 'up4_deconv2_0')
    y1 = _deconv(tx[1], fv, 'up2_deconv_1')
    y2 = tx[2]
    y3 = F.max_pool2d(tx[3], 2, 2)
    _cmp_list(got, [y0, y1, y2, y3])
