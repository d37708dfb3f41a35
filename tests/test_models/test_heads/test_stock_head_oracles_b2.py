"""Torch-oracle forward goldens, batch 2: ISAHead (interlaced grouping +
the output_project block), DMHead/DCM (per-sample dynamic depthwise
filters, incl. the even-filter pad quirk), APCHead/ACM (sigmoid affinity +
residual), NLHead (mmcv NonLocal2d embedded gaussian), GCHead (mmcv
ContextBlock att-pool + channel_add/mul fusions).

Same protocol as test_stock_head_oracles.py: randomize the flax head's
weights, re-run the reference math in plain torch on the same weights,
require forward parity at rtol 1e-4.
"""
import math

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

# reuse the batch-1 plumbing (sys.path has the repo root; tests lack
# __init__.py so import by path)
import importlib.util as _ilu
import os.path as _osp

_spec = _ilu.spec_from_file_location(
    'stock_head_oracles_b1',
    _osp.join(_osp.dirname(_osp.abspath(__file__)),
              'test_stock_head_oracles.py'))
_b1 = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_b1)

HEADS, BN, LOSS = _b1.HEADS, _b1.BN, _b1.LOSS
t, cm, conv, bn, linear = _b1.t, _b1.cm, _b1.conv, _b1.bn, _b1.linear
_run, _cmp = _b1._run, _b1._cmp


# ---------------------------------------------------------------------------
# ISAHead (reference isa_head.py: interlaced sparse self-attention)
# ---------------------------------------------------------------------------
def _isa_attention(x, fv, prefix, isa_channels):
    """reference isa_head.py SelfAttentionBlock: 2-ConvModule key/query,
    plain-conv value (→ in_channels), matmul_norm, then output_project."""
    b, c, h, w = x.shape
    q = cm(cm(x, fv, f'{prefix}/query_project_0'), fv,
           f'{prefix}/query_project_1')
    k = cm(cm(x, fv, f'{prefix}/key_project_0'), fv,
           f'{prefix}/key_project_1')
    v = conv(x, fv, f'{prefix}/value_project_0')
    q = q.reshape(b, isa_channels, -1).permute(0, 2, 1)
    k = k.reshape(b, isa_channels, -1)
    v = v.reshape(b, c, -1).permute(0, 2, 1)
    sim = F.softmax((isa_channels ** -0.5) * torch.matmul(q, k), dim=-1)
    ctx = torch.matmul(sim, v).permute(0, 2, 1).reshape(b, c, h, w)
    return cm(ctx, fv, f'{prefix}/output_project')


def _isa_expected(x_np, fv, down_factor, isa_channels):
    x = t(x_np.transpose(0, 3, 1, 2))
    x = cm(x, fv, 'in_conv', padding=1)
    residual = x
    n, c, h, w = x.shape
    loc_h, loc_w = down_factor
    glb_h, glb_w = math.ceil(h / loc_h), math.ceil(w / loc_w)
    pad_h, pad_w = glb_h * loc_h - h, glb_w * loc_w - w
    if pad_h > 0 or pad_w > 0:
        x = F.pad(x, (pad_w // 2, pad_w - pad_w // 2,
                      pad_h // 2, pad_h - pad_h // 2))
    x = x.view(n, c, glb_h, loc_h, glb_w, loc_w)
    x = x.permute(0, 3, 5, 1, 2, 4).reshape(-1, c, glb_h, glb_w)
    x = _isa_attention(x, fv, 'global_relation', isa_channels)
    x = x.view(n, loc_h, loc_w, c, glb_h, glb_w)
    x = x.permute(0, 4, 5, 3, 1, 2).reshape(-1, c, loc_h, loc_w)
    x = _isa_attention(x, fv, 'local_relation', isa_channels)
    x = x.view(n, glb_h, glb_w, c, loc_h, loc_w)
    x = x.permute(0, 3, 1, 4, 2, 5).reshape(n, c, glb_h * loc_h,
                                            glb_w * loc_w)
    if pad_h > 0 or pad_w > 0:
        x = x[:, :, pad_h // 2:pad_h // 2 + h, pad_w // 2:pad_w // 2 + w]
    x = cm(torch.cat([x, residual], dim=1), fv, 'out_conv')
    return conv(x, fv, 'conv_seg')


def test_isa_head_oracle():
    rng = np.random.RandomState(10)
    x_np = rng.randn(2, 8, 8, 8).astype(np.float32)
    head = HEADS.get('ISAHead')(
        in_channels=8, channels=6, isa_channels=4, down_factor=(2, 2),
        num_classes=3, in_index=0, dropout_ratio=0.0, norm_cfg=BN,
        loss_decode=LOSS)
    fv, got = _run(head, [jnp.asarray(x_np)])
    _cmp(got, _isa_expected(x_np, fv, (2, 2), 4))


def test_isa_head_oracle_nondivisible_pad():
    """7x7 input with (2,2) groups exercises the asymmetric pad/unpad."""
    rng = np.random.RandomState(11)
    x_np = rng.randn(2, 7, 7, 8).astype(np.float32)
    head = HEADS.get('ISAHead')(
        in_channels=8, channels=6, isa_channels=4, down_factor=(2, 2),
        num_classes=3, in_index=0, dropout_ratio=0.0, norm_cfg=BN,
        loss_decode=LOSS)
    fv, got = _run(head, [jnp.asarray(x_np)])
    _cmp(got, _isa_expected(x_np, fv, (2, 2), 4))


# ---------------------------------------------------------------------------
# DMHead / DCM (reference dm_head.py: dynamic per-sample depthwise filters)
# ---------------------------------------------------------------------------
def _dcm_expected(x, fv, prefix, filter_size, fusion):
    gen = conv(F.adaptive_avg_pool2d(x, filter_size), fv,
               f'{prefix}/filter_gen_conv')
    xr = cm(x, fv, f'{prefix}/input_redu_conv')
    b, c, h, w = xr.shape
    xr = xr.reshape(1, b * c, h, w)
    gen = gen.reshape(b * c, 1, filter_size, filter_size)
    pad = (filter_size - 1) // 2
    if (filter_size - 1) % 2 == 0:
        p2d = (pad, pad, pad, pad)
    else:
        p2d = (pad + 1, pad, pad + 1, pad)
    xr = F.pad(xr, p2d)
    out = F.conv2d(xr, gen, groups=b * c).reshape(b, c, h, w)
    out = bn(out, fv, f'{prefix}/norm')
    out = F.relu(out)
    if fusion:
        out = cm(out, fv, f'{prefix}/fusion_conv')
    return out


def test_dm_head_oracle():
    rng = np.random.RandomState(12)
    x_np = rng.randn(2, 8, 8, 8).astype(np.float32)
    # filter size 2 exercises the even-filter LEFT/TOP-heavy pad quirk
    sizes = (1, 2, 3)
    head = HEADS.get('DMHead')(
        in_channels=8, channels=6, filter_sizes=sizes, fusion=True,
        num_classes=3, in_index=0, dropout_ratio=0.0, norm_cfg=BN,
        loss_decode=LOSS)
    fv, got = _run(head, [jnp.asarray(x_np)])
    x = t(x_np.transpose(0, 3, 1, 2))
    outs = [x]
    for i, fs in enumerate(sizes):
        outs.append(_dcm_expected(x, fv, f'dcm_modules_{i}', fs, True))
    out = cm(torch.cat(outs, dim=1), fv, 'bottleneck', padding=1)
    _cmp(got, conv(out, fv, 'conv_seg'))


# ---------------------------------------------------------------------------
# APCHead / ACM (reference apc_head.py: sigmoid affinity vs pooled tokens)
# ---------------------------------------------------------------------------
def _acm_expected(x, fv, prefix, pool_scale, fusion):
    pooled = F.adaptive_avg_pool2d(x, pool_scale)
    xr = cm(x, fv, f'{prefix}/input_redu_conv')
    pooled = cm(pooled, fv, f'{prefix}/pooled_redu_conv')
    b, c = xr.shape[:2]
    pooled = pooled.view(b, c, -1).permute(0, 2, 1)
    gi = cm(F.adaptive_avg_pool2d(xr, 1), fv, f'{prefix}/global_info')
    gi = F.interpolate(gi, size=xr.shape[2:], mode='bilinear',
                       align_corners=False)
    aff = conv(xr + gi, fv, f'{prefix}/gla')
    aff = aff.permute(0, 2, 3, 1).reshape(b, -1, pool_scale ** 2)
    aff = torch.sigmoid(aff)
    z = torch.matmul(aff, pooled).permute(0, 2, 1).reshape(
        b, c, *xr.shape[2:])
    z = cm(z, fv, f'{prefix}/residual_conv')
    z = F.relu(z + xr)
    if fusion:
        z = cm(z, fv, f'{prefix}/fusion_conv')
    return z


def test_apc_head_oracle():
    rng = np.random.RandomState(13)
    x_np = rng.randn(2, 8, 8, 8).astype(np.float32)
    scales = (1, 2)
    head = HEADS.get('APCHead')(
        in_channels=8, channels=6, pool_scales=scales, fusion=True,
        num_classes=3, in_index=0, dropout_ratio=0.0, norm_cfg=BN,
        loss_decode=LOSS)
    fv, got = _run(head, [jnp.asarray(x_np)])
    x = t(x_np.transpose(0, 3, 1, 2))
    outs = [x]
    for i, s in enumerate(scales):
        outs.append(_acm_expected(x, fv, f'acm_modules_{i}', s, True))
    out = cm(torch.cat(outs, dim=1), fv, 'bottleneck', padding=1)
    _cmp(got, conv(out, fv, 'conv_seg'))


# ---------------------------------------------------------------------------
# NLHead (mmcv NonLocal2d embedded_gaussian, use_scale)
# ---------------------------------------------------------------------------
def test_nl_head_oracle():
    rng = np.random.RandomState(14)
    x_np = rng.randn(2, 8, 8, 8).astype(np.float32)
    head = HEADS.get('NLHead')(
        in_channels=8, channels=8, reduction=2, use_scale=True,
        num_classes=3, in_index=0, dropout_ratio=0.0, norm_cfg=BN,
        loss_decode=LOSS)
    fv, got = _run(head, [jnp.asarray(x_np)])
    x = t(x_np.transpose(0, 3, 1, 2))
    out = cm(x, fv, 'convs_0', padding=1)
    n, c, h, w = out.shape
    inter = c // 2
    g_x = conv(out, fv, 'nl_block/g').view(n, inter, -1).permute(0, 2, 1)
    theta = conv(out, fv, 'nl_block/theta').view(n, inter, -1)
    theta = theta.permute(0, 2, 1)
    phi = conv(out, fv, 'nl_block/phi').view(n, inter, -1)
    pw = torch.matmul(theta, phi) / float(inter) ** 0.5
    pw = pw.softmax(dim=-1)
    y = torch.matmul(pw, g_x).permute(0, 2, 1).reshape(n, inter, h, w)
    nl = out + cm(y, fv, 'nl_block/conv_out', act=False)
    out = cm(nl, fv, 'convs_1', padding=1)
    out = cm(torch.cat([x, out], 1), fv, 'conv_cat', padding=1)
    _cmp(got, conv(out, fv, 'conv_seg'))


# ---------------------------------------------------------------------------
# GCHead (mmcv ContextBlock: att pooling + channel_add/channel_mul)
# ---------------------------------------------------------------------------
def _gc_block_expected(x, fv, prefix, fusion_types):
    b, c, h, w = x.shape
    mask = conv(x, fv, f'{prefix}/conv_mask').view(b, 1, -1)
    mask = F.softmax(mask, dim=2)
    context = torch.matmul(mask, x.view(b, c, -1).permute(0, 2, 1))
    context = context.permute(0, 2, 1).reshape(b, c, 1, 1)
    out = x
    for fusion in fusion_types:
        y = conv(context, fv, f'{prefix}/{fusion}_conv1')
        ln_s = t(fv[f'params/{prefix}/{fusion}_ln/scale'])
        ln_b = t(fv[f'params/{prefix}/{fusion}_ln/bias'])
        mu = y.mean(dim=1, keepdim=True)
        var = y.var(dim=1, unbiased=False, keepdim=True)
        y = (y - mu) / torch.sqrt(var + 1e-5)
        y = y * ln_s.view(1, -1, 1, 1) + ln_b.view(1, -1, 1, 1)
        y = F.relu(y)
        y = conv(y, fv, f'{prefix}/{fusion}_conv2')
        if fusion == 'channel_add':
            out = out + y
        else:
            out = out * torch.sigmoid(y)
    return out


def test_gc_head_oracle():
    rng = np.random.RandomState(15)
    x_np = rng.randn(2, 8, 8, 8).astype(np.float32)
    fusions = ('channel_add', 'channel_mul')
    head = HEADS.get('GCHead')(
        in_channels=8, channels=8, ratio=0.5, pooling_type='att',
        fusion_types=fusions, num_classes=3, in_index=0, dropout_ratio=0.0,
        norm_cfg=BN, loss_decode=LOSS)
    fv, got = _run(head, [jnp.asarray(x_np)])
    x = t(x_np.transpose(0, 3, 1, 2))
    out = cm(x, fv, 'convs_0', padding=1)
    gc = _gc_block_expected(out, fv, 'gc_block', fusions)
    out = cm(gc, fv, 'convs_1', padding=1)
    out = cm(torch.cat([x, out], 1), fv, 'conv_cat', padding=1)
    _cmp(got, conv(out, fv, 'conv_seg'))
