"""Torch-oracle goldens, batch 8: the author's MaxViT-UNet (reference
``backbones/maxvit_encoder.py`` + ``decode_heads/maxvit_decoder.py``) —
MBConv (timm DepthwiseSeparableConv + SqueezeExcite semantics), the
heads**-0.5-scaled relative self-attention, contiguous WINDOW and strided
GRID partitions, deconv upsample (+BN+Mish) decoder with skip concats.

Runs the einsum attention path (the fused Pallas kernel is TPU-only and
parity-tested separately in tests/test_ops/test_window_attention.py).
"""
import importlib.util as _ilu
import os.path as _osp

import jax
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
t, conv, bn, _cmp = _b1.t, _b1.conv, _b1.bn, _b1._cmp


def _dense(x, fv, name):
    out = x @ t(fv[f'params/{name}/kernel'])
    b = fv.get(f'params/{name}/bias')
    return out + t(b) if b is not None else out


def _ln(x, fv, name):
    return F.layer_norm(x, (x.shape[-1],), t(fv[f'params/{name}/scale']),
                        t(fv[f'params/{name}/bias']), eps=1e-5)


def _mish(x):
    return x * torch.tanh(F.softplus(x))


def _mbconv(x, fv, p, downscale, out_ch):
    cin = x.shape[1]
    y = bn(x, fv, f'{p}/pre_norm')
    y = conv(y, fv, f'{p}/conv_pw_exp')
    w = t(fv[f'params/{p}/conv_dw/conv/kernel'].transpose(3, 2, 0, 1))
    y = F.conv2d(y, w, None, stride=2 if downscale else 1, padding=1,
                 groups=cin)
    y = F.gelu(bn(y, fv, f'{p}/bn_dw'))
    y = bn(conv(y, fv, f'{p}/conv_pw'), fv, f'{p}/bn_pw')
    s = y.mean((2, 3), keepdim=True)
    s = F.relu(conv(s, fv, f'{p}/se/conv_reduce'))
    s = torch.sigmoid(conv(s, fv, f'{p}/se/conv_expand'))
    y = y * s
    y = conv(y, fv, f'{p}/conv_proj')
    if downscale:
        skip = conv(F.max_pool2d(x, 2, 2), fv, f'{p}/skip_conv')
    elif cin != out_ch:
        skip = conv(x, fv, f'{p}/skip_conv')
    else:
        skip = x
    return y + skip


def _rel_index(gh, gw):
    coords = np.stack(np.meshgrid(np.arange(gh), np.arange(gw),
                                  indexing='ij')).reshape(2, -1)
    rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0)
    rel[..., 0] += gh - 1
    rel[..., 1] += gw - 1
    rel[..., 0] *= 2 * gw - 1
    return rel.sum(-1)


def _rel_attention(x, fv, p, heads, gws):
    B_, N, C = x.shape
    scale = heads ** -0.5  # reference quirk: heads, not head_dim
    qkv = _dense(x, fv, f'{p}/qkv_mapping')
    qkv = qkv.reshape(B_, N, 3, heads, -1).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * scale, qkv[1], qkv[2]
    attn = q @ k.transpose(-2, -1)
    table = t(fv[f'params/{p}/relative_position_bias_table'])
    bias = table[torch.from_numpy(_rel_index(*gws)).reshape(-1)].reshape(
        N, N, heads).permute(2, 0, 1)
    attn = torch.softmax(attn + bias.unsqueeze(0), dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(B_, N, C)
    return _dense(out, fv, f'{p}/proj')


def _tf_block(x, fv, p, part, heads, gws):
    """x NCHW; partition → LN → attn → +res; LN → MLP → +res; reverse."""
    B, C, H, W = x.shape
    gh, gw = gws
    xh = x.permute(0, 2, 3, 1)  # NHWC
    if part == 'window':
        win = xh.reshape(B, H // gh, gh, W // gw, gw, C)
        win = win.permute(0, 1, 3, 2, 4, 5).reshape(-1, gh * gw, C)
    else:  # grid: strided tokens
        win = xh.reshape(B, gh, H // gh, gw, W // gw, C)
        win = win.permute(0, 2, 4, 1, 3, 5).reshape(-1, gh * gw, C)
    a = _ln(win, fv, f'{p}/norm_1')
    a = _rel_attention(a, fv, f'{p}/attention', heads, gws)
    win = win + a
    m = _ln(win, fv, f'{p}/norm_2')
    m = F.gelu(_dense(m, fv, f'{p}/mlp/fc1'))
    m = _dense(m, fv, f'{p}/mlp/fc2')
    win = win + m
    if part == 'window':
        y = win.reshape(B, H // gh, W // gw, gh, gw, C)
        y = y.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
    else:
        y = win.reshape(B, H // gh, W // gw, gh, gw, C)
        y = y.permute(0, 3, 1, 4, 2, 5).reshape(B, H, W, C)
    return y.permute(0, 3, 1, 2)


def _maxvit_block(x, fv, p, downscale, out_ch, heads, gws):
    x = _mbconv(x, fv, f'{p}/mb_conv', downscale, out_ch)
    x = _tf_block(x, fv, f'{p}/block_transformer', 'window', heads, gws)
    x = _tf_block(x, fv, f'{p}/grid_transformer', 'grid', heads, gws)
    return x


def _deconv_module(x, fv, p):
    # flax ConvTranspose kernel (kh,kw,in,out) → torch weight flipped
    w = t(np.ascontiguousarray(
        fv[f'params/{p}/deconv/kernel'][::-1, ::-1].transpose(2, 3, 0, 1)))
    b_ = t(fv[f'params/{p}/deconv/bias'])
    x = F.conv_transpose2d(x, w, b_, stride=2, padding=1)
    return _mish(bn(x, fv, f'{p}/norm'))


def test_maxvit_unet_oracle():
    from stc_unet_tpu.models.builder import BACKBONES
    rng = np.random.RandomState(70)
    img = rng.randn(1, 32, 32, 3).astype(np.float32)
    depths, channels, heads, gws = (1, 1, 1), (4, 8, 16), 2, (2, 2)
    backbone = BACKBONES.get('MaxViT')(
        in_channels=3, depths=depths, channels=channels, embed_dim=4,
        num_heads=heads, grid_window_size=gws, mlp_ratio=2.0)
    decoder = HEADS.get('MaxViTDecoder')(
        in_channels=list(channels), channels=4, depths=(1, 1),
        output_size=(8, 8), num_heads=heads, grid_window_size=gws,
        in_index=(0, 1, 2),
        mlp_ratio=2.0, num_classes=3, dropout_ratio=0.0, loss_decode=LOSS)
    rngs = {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)}
    bv = backbone.init(rngs, jnp.asarray(img), train=False)
    bv = _b1._randomize(bv, 70)
    outs = backbone.apply(bv, jnp.asarray(img), train=False)
    dv = decoder.init(rngs, outs, train=False)
    dv = _b1._randomize(dv, 71)
    got = decoder.apply(dv, outs, train=False)
    bfv, dfv = _b1._flat(bv), _b1._flat(dv)

    # ---- torch encoder
    x = t(img.transpose(0, 3, 1, 2))
    w = t(bfv['params/stem_0/conv/kernel'].transpose(3, 2, 0, 1))
    x = F.gelu(F.conv2d(x, w, t(bfv['params/stem_0/conv/bias']),
                        stride=2, padding=1))
    x = F.gelu(conv(x, bfv, 'stem_2', padding=1))
    feats = []
    for i, (d, ch) in enumerate(zip(depths, channels)):
        for j in range(d):
            x = _maxvit_block(x, bfv, f'stages_{i}/blocks_{j}', j == 0,
                              ch, heads, gws)
        feats.append(x)
    for i in range(3):
        got_f = np.asarray(outs[i], np.float32).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got_f, feats[i].numpy(), rtol=1e-4,
                                   atol=1e-4, err_msg=f'encoder stage {i}')

    # ---- torch decoder
    x = feats[-1]
    for i in range(2):
        skip = feats[3 - i - 2]
        x = _deconv_module(x, dfv, f'stages_{i}/upsample')
        x = torch.cat([skip, x], dim=1)
        x = _maxvit_block(x, dfv, f'stages_{i}/blocks_0', False,
                          channels[3 - i - 2], heads, gws)
    x = F.interpolate(x, size=(8, 8), mode='bilinear', align_corners=False)
    expected = conv(x, dfv, 'conv_seg')
    _cmp(got, expected)


# ---------------------------------------------------------------------------
# DC-UNet (reference decode_heads/dc_unet_head.py: reflect-pad convs,
# BN affine only without relu/sigmoid, dual-chain blocks, tanh output)
# ---------------------------------------------------------------------------
def _convbn(x, fv, p, k, act='relu'):
    pad = k // 2
    if pad:
        x = F.pad(x, (pad, pad, pad, pad), mode='reflect')
    w = t(fv[f'params/{p}/0/conv/kernel'].transpose(3, 2, 0, 1))
    x = F.conv2d(x, w, None)
    affine = act not in ('relu', 'sigmoid')
    if affine:
        weight = t(fv[f'params/{p}/1/scale'])
        bias = t(fv[f'params/{p}/1/bias'])
    else:
        weight = bias = None
    x = F.batch_norm(x, t(fv[f'batch_stats/{p}/1/mean']),
                     t(fv[f'batch_stats/{p}/1/var']), weight, bias,
                     training=False, eps=1e-5)
    if act == 'relu':
        x = F.relu(x)
    elif act == 'sigmoid':
        x = torch.sigmoid(x)
    elif act == 'tanh':
        x = torch.tanh(x)
    return x


def _plain_bn(x, fv, p):
    return F.batch_norm(x, t(fv[f'batch_stats/{p}/mean']),
                        t(fv[f'batch_stats/{p}/var']),
                        t(fv[f'params/{p}/scale']),
                        t(fv[f'params/{p}/bias']), training=False, eps=1e-5)


def _dcblock(x, fv, p, u, alpha=1.67):
    w = alpha * u
    c3, c5, c7 = int(w * 0.167), int(w * 0.333), int(w * 0.5)
    sc = _convbn(x, fv, f'{p}/conv2d_bn', 1, act=None)
    a3 = _convbn(x, fv, f'{p}/conv3x3', 3)
    a5 = _convbn(a3, fv, f'{p}/conv5x5', 3)
    a7 = _convbn(a5, fv, f'{p}/conv7x7', 3)
    out = _plain_bn(torch.cat([a3, a5, a7], 1), fv, f'{p}/bn_1')
    b3 = _convbn(x, fv, f'{p}/conv3x3_2', 3)
    b5 = _convbn(b3, fv, f'{p}/conv5x5_2', 3)
    b7 = _convbn(b5, fv, f'{p}/conv7x7_2', 3)
    out2 = _plain_bn(torch.cat([b3, b5, b7], 1), fv, f'{p}/bn_1_2')
    return _plain_bn(F.relu(sc + out + out2), fv, f'{p}/bn_2')


def _respath(x, fv, p, length):
    names = ['first_block'] + [f'blocks_{i}' for i in range(length - 1)]
    for nm in names:
        sc = _convbn(x, fv, f'{p}/{nm}/conv2d_bn1', 1, act=None)
        y = _convbn(x, fv, f'{p}/{nm}/conv2d_bn2', 3)
        x = _plain_bn(F.relu(sc + y), fv, f'{p}/{nm}/bn')
    return x


def _deconv2x(x, fv, p):
    w = t(np.ascontiguousarray(
        fv[f'params/{p}/deconv/kernel'][::-1, ::-1].transpose(2, 3, 0, 1)))
    b_ = t(fv[f'params/{p}/deconv/bias'])
    return F.conv_transpose2d(x, w, b_, stride=2)


def test_dc_unet_oracle():
    rng = np.random.RandomState(72)
    img = rng.randn(1, 32, 32, 3).astype(np.float32)
    nf = 8
    head = HEADS.get('DC_Unet')(
        nf=nf, out_channels=2, num_classes=2, dropout_ratio=0.0,
        norm_cfg=BN, loss_decode=LOSS)
    rngs = {'params': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(1)}
    v = head.init(rngs, jnp.asarray(img), train=False)
    v = _b1._randomize(v, 72)
    got = head.apply(v, jnp.asarray(img), train=False)
    fv = _b1._flat(v)

    x = t(img.transpose(0, 3, 1, 2))
    m1 = _dcblock(x, fv, 'mres_block1', nf)
    pool = F.max_pool2d(m1, 2)
    m1 = _respath(m1, fv, 'res_path1', 4)
    m2 = _dcblock(pool, fv, 'mres_block2', nf * 2)
    pool = F.max_pool2d(m2, 2)
    m2 = _respath(m2, fv, 'res_path2', 3)
    m3 = _dcblock(pool, fv, 'mres_block3', nf * 4)
    pool = F.max_pool2d(m3, 2)
    m3 = _respath(m3, fv, 'res_path3', 2)
    m4 = _dcblock(pool, fv, 'mres_block4', nf * 8)
    pool = F.max_pool2d(m4, 2)
    m4 = _respath(m4, fv, 'res_path4', 1)
    m = _dcblock(pool, fv, 'mres_block5', nf * 16)
    m = _dcblock(torch.cat([_deconv2x(m, fv, 'deconv1'), m4], 1), fv,
                 'mres_block6', nf * 8)
    m = _dcblock(torch.cat([_deconv2x(m, fv, 'deconv2'), m3], 1), fv,
                 'mres_block7', nf * 4)
    m = _dcblock(torch.cat([_deconv2x(m, fv, 'deconv3'), m2], 1), fv,
                 'mres_block8', nf * 2)
    m = _dcblock(torch.cat([_deconv2x(m, fv, 'deconv4'), m1], 1), fv,
                 'mres_block9', nf)
    expected = _convbn(m, fv, 'conv10', 1, act='tanh')
    _cmp(got, expected)
