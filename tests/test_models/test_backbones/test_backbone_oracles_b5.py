"""Torch-oracle forward goldens, backbone batch 5 (VERDICT r4 #4):
stock UNet (``backbones/unet.py:225`` — BasicConvBlock/DeconvModule/
InterpConv), ERFNet (``erfnet.py`` — BN eps 1e-3, downsampler pool-resize,
mmseg dropout recipe), ICNet (``icnet.py`` — mid-network trunk split,
ceil-mode maxpool, PSP), FastSCNN (``fast_scnn.py`` — LTD dw-act=None,
GFE PPM, FFM).

Protocol as batches 1-4: randomize flax weights, re-run the reference math
in plain torch on the same weights, rtol 1e-4.
"""
import importlib.util as _ilu
import os.path as _osp

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

_here = _osp.dirname(_osp.abspath(__file__))
_spec = _ilu.spec_from_file_location(
    'stock_head_oracles_for_bb5',
    _osp.join(_osp.dirname(_here), 'test_heads',
              'test_stock_head_oracles.py'))
_b1 = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_b1)
t, _randomize, _flat = _b1.t, _b1._randomize, _b1._flat


def _bn(x, fv, name, eps=1e-5):
    return F.batch_norm(
        x, t(fv[f'batch_stats/{name}/mean']),
        t(fv[f'batch_stats/{name}/var']),
        t(fv[f'params/{name}/scale']), t(fv[f'params/{name}/bias']),
        training=False, eps=eps)


def _conv(x, fv, name, stride=1, padding=0, dilation=1, groups=1):
    w = t(fv[f'params/{name}/conv/kernel'].transpose(3, 2, 0, 1))
    b = fv.get(f'params/{name}/conv/bias')
    return F.conv2d(x, w, t(b) if b is not None else None, stride=stride,
                    padding=padding, dilation=dilation, groups=groups)


def _cm(x, fv, name, stride=1, padding=0, dilation=1, groups=1,
        act='relu', eps=1e-5):
    w = t(fv[f'params/{name}/conv_m/conv/kernel'].transpose(3, 2, 0, 1))
    b = fv.get(f'params/{name}/conv_m/conv/bias')
    x = F.conv2d(x, w, t(b) if b is not None else None, stride=stride,
                 padding=padding, dilation=dilation, groups=groups)
    if f'params/{name}/bn/scale' in fv:
        x = _bn(x, fv, f'{name}/bn', eps=eps)
    return F.relu(x) if act == 'relu' else x


def _run(mod, img, seed=51):
    rngs = {'params': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(1)}
    v = mod.init(rngs, jnp.asarray(img), train=False)
    v = _randomize(v, seed)
    got = mod.apply(v, jnp.asarray(img), train=False)
    return _flat(v), got


def _ct(x, fv, name, stride=2, padding=0, output_padding=0):
    """flax ConvTranspose (no kernel flip) → torch conv_transpose2d
    (gradient op, flips): flip kernel spatially, (kh,kw,in,out)→(in,out,..)."""
    k = fv[f'params/{name}/conv/kernel'][::-1, ::-1]
    w = t(np.ascontiguousarray(k.transpose(2, 3, 0, 1)))
    b = fv.get(f'params/{name}/conv/bias')
    return F.conv_transpose2d(x, w, t(b) if b is not None else None,
                              stride=stride, padding=padding,
                              output_padding=output_padding)


# ------------------------------------------------------------ stock UNet ----

def _unet_torch(x, fv, base, num_stages=5, deconv=False):
    enc = []
    for i in range(num_stages):
        if i > 0:
            x = F.max_pool2d(x, 2)
        for j in range(2):
            x = _cm(x, fv, f'encoder_{i}/convs_{j}', padding=1)
        enc.append(x)
    outs = [x]
    for i in reversed(range(num_stages - 1)):
        p = f'decoder_{i}'
        if deconv:
            # DeconvModule: flax VALID ConvTranspose k4 s2 then crop 1 —
            # ≙ torch ConvTranspose2d(k4, s2, padding=1) (unet.py:90-148)
            k = fv[f'params/{p}/upsample/deconv/kernel'][::-1, ::-1]
            w = t(np.ascontiguousarray(k.transpose(2, 3, 0, 1)))
            b = t(fv[f'params/{p}/upsample/deconv/bias'])
            x = F.conv_transpose2d(x, w, b, stride=2, padding=1)
            x = F.relu(_bn(x, fv, f'{p}/upsample/norm'))
        else:
            # InterpConv: bilinear x2 (align_corners=False) then 1x1 conv
            x = F.interpolate(x, scale_factor=2, mode='bilinear',
                              align_corners=False)
            x = _cm(x, fv, f'{p}/upsample/conv')
        x = torch.cat([enc[i], x], 1)
        for j in range(2):
            x = _cm(x, fv, f'{p}/conv_block/convs_{j}', padding=1)
        outs.append(x)
    return outs


def test_unet_interpconv_oracle():
    from stc_unet_tpu.models.builder import BACKBONES
    rng = np.random.RandomState(50)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    mod = BACKBONES.get('UNet')(base_channels=4, norm_cfg=dict(type='BN'))
    fv, got = _run(mod, img, seed=51)
    outs = _unet_torch(t(img.transpose(0, 3, 1, 2)), fv, 4)
    assert len(got) == 5
    for g, e in zip(got, outs):
        np.testing.assert_allclose(
            np.asarray(g, np.float32).transpose(0, 3, 1, 2), e.numpy(),
            rtol=1e-4, atol=1e-4)


def test_unet_deconv_oracle():
    from stc_unet_tpu.models.builder import BACKBONES
    rng = np.random.RandomState(52)
    img = rng.randn(1, 32, 32, 3).astype(np.float32)
    mod = BACKBONES.get('UNet')(base_channels=4, norm_cfg=dict(type='BN'),
                                upsample_cfg=dict(type='DeconvModule'))
    fv, got = _run(mod, img, seed=53)
    outs = _unet_torch(t(img.transpose(0, 3, 1, 2)), fv, 4, deconv=True)
    for g, e in zip(got, outs):
        np.testing.assert_allclose(
            np.asarray(g, np.float32).transpose(0, 3, 1, 2), e.numpy(),
            rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------- ERFNet ----

def test_erfnet_oracle():
    """ERFNet at an ODD input size: exercises the downsampler's
    bilinear pool-resize (erfnet.py:54-62), BN eps 1e-3, the torch-exact
    upsampler ConvTranspose (k3 s2 p1 op1), and the mmseg per-block
    dropout recipe (inert in eval)."""
    from stc_unet_tpu.models.builder import BACKBONES
    rng = np.random.RandomState(54)
    img = rng.randn(1, 54, 54, 3).astype(np.float32)
    mod = BACKBONES.get('ERFNet')(
        enc_downsample_channels=(4, 8, 16),
        enc_stage_non_bottlenecks=(2, 4),
        enc_non_bottleneck_dilations=(2, 4),
        enc_non_bottleneck_channels=(8, 16),
        dec_upsample_channels=(8, 4),
        dec_stages_non_bottleneck=(1, 1),
        dec_non_bottleneck_channels=(8, 4))
    fv, got = _run(mod, img, seed=55)

    def down(x, name):
        conv = _conv(x, fv, f'{name}/conv', stride=2, padding=1)
        pool = F.max_pool2d(x, 2, 2)
        if pool.shape[2:] != conv.shape[2:]:
            pool = F.interpolate(pool, size=conv.shape[2:], mode='bilinear',
                                 align_corners=False)
        return F.relu(_bn(torch.cat([conv, pool], 1), fv, f'{name}/bn',
                          eps=1e-3))

    def nb1d(x, name, d=1):
        y = F.relu(_conv(x, fv, f'{name}/conv1a', padding=(1, 0)))
        y = _conv(y, fv, f'{name}/conv1b', padding=(0, 1))
        y = F.relu(_bn(y, fv, f'{name}/bn1', eps=1e-3))
        y = F.relu(_conv(y, fv, f'{name}/conv2a', padding=(d, 0),
                         dilation=(d, 1)))
        y = _conv(y, fv, f'{name}/conv2b', padding=(0, d), dilation=(1, d))
        y = _bn(y, fv, f'{name}/bn2', eps=1e-3)
        return F.relu(x + y)

    x = t(img.transpose(0, 3, 1, 2))
    x = down(x, 'down0')
    x = down(x, 'down1')
    for i in range(2):
        x = nb1d(x, f'enc1_{i}')
    x = down(x, 'down2')
    for i in range(4):
        x = nb1d(x, f'enc2_{i}', d=(2, 4)[i % 2])
    for si in range(2):
        x = F.relu(_bn(_ct(x, fv, f'up{si}', stride=2, padding=1,
                           output_padding=1), fv, f'up{si}_bn', eps=1e-3))
        x = nb1d(x, f'dec{si}_0')
    np.testing.assert_allclose(
        np.asarray(got[0], np.float32).transpose(0, 3, 1, 2), x.numpy(),
        rtol=1e-4, atol=1e-4)


# ----------------------------------------------------------------- ICNet ----

def test_icnet_oracle():
    """ICNet mid-network split (icnet.py:140-156): stem + CEIL-mode
    maxpool + layer1/2 at half res; layer2 feature halved again before
    layer3/4; PSP with pools-before-x concat; three branch outputs."""
    from stc_unet_tpu.models.builder import BACKBONES
    b4_spec = _ilu.spec_from_file_location(
        'backbone_oracles_b4_for_b5',
        _osp.join(_here, 'test_backbone_oracles_b4.py'))
    b4 = _ilu.module_from_spec(b4_spec)
    b4_spec.loader.exec_module(b4)

    rng = np.random.RandomState(56)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    mod = BACKBONES.get('ICNet')(
        backbone_cfg=dict(type='ResNetV1c', depth=50, base_channels=4,
                          stem_channels=4, strides=(1, 2, 1, 1),
                          dilations=(1, 1, 2, 4), contract_dilation=True,
                          norm_cfg=dict(type='BN')),
        layer_channels=(32, 128),   # base 4: layer2=4*2*4, layer4=4*8*4
        light_branch_middle_channels=4, psp_out_channels=16,
        out_channels=(4, 8, 8), norm_cfg=dict(type='BN'))
    fv, got = _run(mod, img, seed=57)

    x = t(img.transpose(0, 3, 1, 2))
    # sub1
    s1 = x
    for i in range(3):
        s1 = _cm(s1, fv, f'conv_sub1_{i}', stride=2, padding=1)
    # trunk at half res with ceil maxpool and mid-split
    half = F.interpolate(x, scale_factor=0.5, mode='bilinear',
                         align_corners=False)
    pre = 'ResNetV1c_0/'
    h = half
    for j in range(3):
        h = F.relu(_b1.bn(b4._conv(h, fv, f'{pre}stem_conv{j}',
                                   2 if j == 0 else 1, padding=1),
                          fv, f'{pre}stem_bn{j}'))
    h = F.max_pool2d(h, 3, 2, padding=1, ceil_mode=True)
    in_ch = h.shape[1]
    feats = []
    for s, nb in enumerate((3, 4, 6, 3)):
        if s == 2:
            h = F.interpolate(h, scale_factor=0.5, mode='bilinear',
                              align_corners=False)
        planes = 4 * 2 ** s
        dil_s = (1, 1, 2, 4)[s]
        for i in range(nb):
            if i == 0 and dil_s > 1:
                dil = dil_s // 2   # contract_dilation
            else:
                dil = dil_s
            stride = (1, 2, 1, 1)[s] if i == 0 else 1
            ds = i == 0 and (stride != 1 or in_ch != planes * 4)
            h = b4._bottleneck(h, fv, f'{pre}layer{s + 1}/{i}', stride,
                               dil, ds)
            in_ch = planes * 4
        feats.append(h)
    s2 = _cm(feats[1], fv, 'conv_sub2')
    # PSP: pooled branches (→ psp_out_channels) first, then x
    x4 = feats[3]
    pools = []
    for i, sc in enumerate((1, 2, 3, 6)):
        p = F.adaptive_avg_pool2d(x4, sc)
        p = _cm(p, fv, f'psp/pool_convs_{i}')
        pools.append(F.interpolate(p, size=x4.shape[2:], mode='bilinear',
                                   align_corners=False))
    s4 = _cm(torch.cat(pools + [x4], 1), fv, 'psp/bottleneck', padding=1)
    s4 = _cm(s4, fv, 'conv_sub4')
    expected = [s1, s2, s4]
    assert len(got) == 3
    for g, e in zip(got, expected):
        np.testing.assert_allclose(
            np.asarray(g, np.float32).transpose(0, 3, 1, 2), e.numpy(),
            rtol=1e-4, atol=1e-4)


# -------------------------------------------------------------- FastSCNN ----

def test_fast_scnn_oracle():
    from stc_unet_tpu.models.builder import BACKBONES
    rng = np.random.RandomState(58)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    mod = BACKBONES.get('FastSCNN')(
        downsample_dw_channels=(4, 6), global_in_channels=8,
        global_block_channels=(8, 12, 16), global_out_channels=16,
        higher_in_channels=8, lower_in_channels=16,
        fusion_out_channels=16, norm_cfg=dict(type='BN'))
    fv, got = _run(mod, img, seed=59)

    def dsconv(x, name):
        # dw conv + BN, NO act (dw_act_cfg=None); pw conv + BN + ReLU
        x = _cm(x, fv, f'{name}/depthwise_conv', stride=2, padding=1,
                groups=x.shape[1], act=None)
        return _cm(x, fv, f'{name}/pointwise_conv')

    def inv_res(x, name, stride, out_ch):
        # GFE passes its act_cfg (ReLU) into InvertedResidual — NOT the
        # block's ReLU6 default (reference fast_scnn.py:168-183)
        in_ch = x.shape[1]
        y = _cm(x, fv, f'{name}/expand_conv')
        y = _cm(y, fv, f'{name}/depthwise_conv', stride=stride, padding=1,
                groups=y.shape[1])
        y = _cm(y, fv, f'{name}/linear_conv', act=None)
        return x + y if (stride == 1 and in_ch == out_ch) else y

    x = t(img.transpose(0, 3, 1, 2))
    x = _cm(x, fv, 'ld_conv', stride=2, padding=1)
    x = dsconv(x, 'ld_dsconv1')
    higher = dsconv(x, 'ld_dsconv2')
    g = higher
    for i, (ch, s) in enumerate(zip((8, 12, 16), (2, 2, 1))):
        for j in range(3):
            g = inv_res(g, f'gfe_{i}_{j}', s if j == 0 else 1, ch)
    # PPM: x first, branch width in//4, 3x3 bottleneck
    pools = []
    for i, sc in enumerate((1, 2, 3, 6)):
        p = F.adaptive_avg_pool2d(g, sc)
        p = _cm(p, fv, f'ppm/pool_convs_{i}')
        pools.append(F.interpolate(p, size=g.shape[2:], mode='bilinear',
                                   align_corners=False))
    lower = _cm(torch.cat([g] + pools, 1), fv, 'ppm/bottleneck', padding=1)
    low = F.interpolate(lower, size=higher.shape[2:], mode='bilinear',
                        align_corners=False)
    low = _cm(low, fv, 'ffm_dwconv', padding=1, groups=low.shape[1])
    low = _cm(low, fv, 'ffm_low_conv', act=None)
    high = _cm(higher, fv, 'ffm_high_conv', act=None)
    fused = F.relu(high + low)
    expected = [higher, lower, fused]
    assert len(got) == 3
    for g_, e in zip(got, expected):
        np.testing.assert_allclose(
            np.asarray(g_, np.float32).transpose(0, 3, 1, 2), e.numpy(),
            rtol=1e-4, atol=1e-4)
