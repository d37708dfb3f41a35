"""Torch-oracle goldens, batch 5: SegmenterMaskTransformerHead (cls-token
mask transformer: token concat order, l2-normalized patch/class dot
products, mask LayerNorm), SETRUPHead (pre-conv token LayerNorm + staged
up-convs), SETRMLAHead (per-level double conv + upsample + concat), and the
STDCHead multi-scale detail-aggregation LOSS target (laplacian pyramid,
nearest upsample, fixed fusion kernel).

Same protocol as batches 1-4.
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
t, cm, conv, _run, _cmp = _b1.t, _b1.cm, _b1.conv, _b1._run, _b1._cmp


def _ln(x, fv, name, eps=1e-6):
    return F.layer_norm(x, (x.shape[-1],), t(fv[f'params/{name}/scale']),
                        t(fv[f'params/{name}/bias']), eps=eps)


def _dense(x, fv, name):
    out = x @ t(fv[f'params/{name}/kernel'])
    b = fv.get(f'params/{name}/bias')
    return out + t(b) if b is not None else out


def _vit_block(x, fv, prefix, num_heads):
    """our _VitBlock layout (timm-style fused qkv Dense) with torch math —
    the parameterization maps 1:1 onto the reference TransformerEncoderLayer
    (packed in_proj == qkv kernel transposed)."""
    b, n, c = x.shape
    hd = c // num_heads
    a = _ln(x, fv, f'{prefix}/norm1')
    qkv = _dense(a, fv, f'{prefix}/attn/qkv/linear'
                 if f'params/{prefix}/attn/qkv/linear/kernel' in fv
                 else f'{prefix}/attn/qkv')
    qkv = qkv.reshape(b, n, 3, num_heads, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    att = F.softmax((q @ k.transpose(-1, -2)) * hd ** -0.5, dim=-1)
    out = (att @ v).permute(0, 2, 1, 3).reshape(b, n, c)
    out = _dense(out, fv, f'{prefix}/attn/proj'
                 if f'params/{prefix}/attn/proj/kernel' in fv
                 else f'{prefix}/attn/proj/linear')
    x = x + out
    m = _ln(x, fv, f'{prefix}/norm2')
    m = F.gelu(_dense(m, fv, f'{prefix}/fc1'))
    m = _dense(m, fv, f'{prefix}/fc2')
    return x + m


def test_segmenter_mask_head_oracle():
    rng = np.random.RandomState(40)
    x_np = rng.randn(2, 4, 4, 10).astype(np.float32)
    head = HEADS.get('SegmenterMaskTransformerHead')(
        in_channels=10, channels=8, embed_dims=8, num_layers=2,
        num_heads=2, num_classes=5, in_index=0, dropout_ratio=0.0,
        drop_path_rate=0.0, loss_decode=LOSS)
    fv, got = _run(head, [jnp.asarray(x_np)])

    b, h, w, c = x_np.shape
    x = t(x_np.reshape(b, h * w, c))
    x = _dense(x, fv, 'dec_proj/linear')
    cls_emb = t(fv['params/cls_emb']).expand(b, -1, -1)
    x = torch.cat((x, cls_emb), 1)
    for i in range(2):
        x = _vit_block(x, fv, f'layers_{i}', 2)
    x = _ln(x, fv, 'decoder_norm')
    patches = _dense(x[:, :-5], fv, 'patch_proj/linear')
    cls_feat = _dense(x[:, -5:], fv, 'classes_proj/linear')
    patches = F.normalize(patches, dim=2, p=2)
    cls_feat = F.normalize(cls_feat, dim=2, p=2)
    masks = patches @ cls_feat.transpose(1, 2)
    masks = _ln(masks, fv, 'mask_norm')
    expected = masks.permute(0, 2, 1).reshape(b, 5, h, w)
    # 5e-4: the L2-normalize + mask LayerNorm chain amplifies f32
    # fusion-order differences across XLA:CPU hosts (observed 3e-4 drift
    # when the AOT cache was built on a different machine).
    _cmp(got, expected, rtol=5e-4, atol=5e-4)


def test_setr_up_head_oracle():
    rng = np.random.RandomState(41)
    x_np = rng.randn(2, 4, 4, 8).astype(np.float32)
    head = HEADS.get('SETRUPHead')(
        in_channels=8, channels=6, num_convs=2, up_scale=2, kernel_size=3,
        num_classes=3, in_index=0, dropout_ratio=0.0, norm_cfg=BN,
        loss_decode=LOSS)
    fv, got = _run(head, [jnp.asarray(x_np)])
    b, h, w, c = x_np.shape
    x = t(x_np.reshape(b, h * w, c))
    x = _ln(x, fv, 'norm').reshape(b, h, w, c).permute(0, 3, 1, 2)
    for i in range(2):
        x = cm(x, fv, f'up_convs_{i}', padding=1)
        x = F.interpolate(x, scale_factor=2, mode='bilinear',
                          align_corners=False)
    _cmp(got, conv(x, fv, 'conv_seg'))


def test_setr_mla_head_oracle():
    rng = np.random.RandomState(42)
    xs = [rng.randn(2, 4, 4, 6).astype(np.float32) for _ in range(2)]
    head = HEADS.get('SETRMLAHead')(
        in_channels=[6, 6], channels=8, mla_channels=4, up_scale=2,
        num_classes=3, in_index=(0, 1), dropout_ratio=0.0, norm_cfg=BN,
        loss_decode=LOSS)
    fv, got = _run(head, [jnp.asarray(x) for x in xs])
    outs = []
    for i, x_np in enumerate(xs):
        x = t(x_np.transpose(0, 3, 1, 2))
        x = cm(x, fv, f'up_convs_{i}_0', padding=1)
        x = cm(x, fv, f'up_convs_{i}_1', padding=1)
        outs.append(F.interpolate(x, scale_factor=2, mode='bilinear',
                                  align_corners=False))
    out = torch.cat(outs, dim=1)
    _cmp(got, conv(out, fv, 'conv_seg'))


def test_stdc_detail_loss_target_oracle():
    """STDC detail-aggregation loss vs the reference pyramid construction
    (stdc_head.py:40-85) — loss VALUES must match, which requires the
    same multi-scale boundary target."""
    rng = np.random.RandomState(43)
    gt_np = rng.randint(0, 2, (2, 16, 16)).astype(np.int64)
    logit_np = rng.randn(2, 16, 16, 1).astype(np.float32)
    head = HEADS.get('STDCHead')(
        in_channels=8, channels=8, num_convs=1, concat_input=False,
        num_classes=2, boundary_threshold=0.1, in_index=0,
        dropout_ratio=0.0, norm_cfg=BN,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=True,
                         loss_weight=1.0))
    got = head.loss_by_feat(jnp.asarray(logit_np), jnp.asarray(gt_np))

    # torch target construction (reference verbatim)
    lap = torch.tensor([-1, -1, -1, -1, 8, -1, -1, -1, -1],
                       dtype=torch.float32).reshape(1, 1, 3, 3)
    fusion = torch.tensor([[6. / 10], [3. / 10], [1. / 10]],
                          dtype=torch.float32).reshape(1, 3, 1, 1)
    seg_label = t(gt_np[:, None].astype(np.float32))
    bt = F.conv2d(seg_label, lap, padding=1).clamp(min=0)
    bt[bt > 0.1] = 1
    bt[bt <= 0.1] = 0
    bt2 = F.conv2d(seg_label, lap, stride=2, padding=1).clamp(min=0)
    bt4 = F.conv2d(seg_label, lap, stride=4, padding=1).clamp(min=0)
    bt2 = F.interpolate(bt2, bt.shape[2:], mode='nearest')
    bt4 = F.interpolate(bt4, bt.shape[2:], mode='nearest')
    bt2 = (bt2 > 0.1).float()
    bt4 = (bt4 > 0.1).float()
    pyr = torch.stack((bt, bt2, bt4), dim=1).squeeze(2)
    target = F.conv2d(pyr, fusion)
    target = (target > 0.1).float()

    # torch BCE with the same logits (use_sigmoid path, mean reduction)
    logits = t(logit_np[..., 0])
    expected = F.binary_cross_entropy_with_logits(
        logits, target[:, 0], reduction='mean')
    np.testing.assert_allclose(float(got['loss_ce']),
                               float(expected), rtol=1e-4)


# ---------------------------------------------------------------------------
# DPTHead (reference dpt_head.py: reassemble + readout + fusion pyramid)
# ---------------------------------------------------------------------------
def _pre_act_rcu(x, fv, prefix):
    """PreActResidualConvUnit: act→conv→norm twice, residual."""
    y = F.relu(x)
    y = conv(y, fv, f'{prefix}/conv1/conv_m', padding=1)
    y = _b1.bn(y, fv, f'{prefix}/conv1/bn')
    y = F.relu(y)
    y = conv(y, fv, f'{prefix}/conv2/conv_m', padding=1)
    y = _b1.bn(y, fv, f'{prefix}/conv2/bn')
    return x + y


def _fusion_block(x, fv, prefix, skip=None):
    if skip is not None:
        if skip.shape[2:] != x.shape[2:]:
            skip = F.interpolate(skip, size=x.shape[2:], mode='bilinear',
                                 align_corners=False)
        x = x + _pre_act_rcu(skip, fv, f'{prefix}/res_conv_unit1')
    x = _pre_act_rcu(x, fv, f'{prefix}/res_conv_unit2')
    x = F.interpolate(x, scale_factor=2, mode='bilinear',
                      align_corners=True)
    return conv(x, fv, f'{prefix}/project/conv_m')


def test_dpt_head_oracle_readout_project():
    rng = np.random.RandomState(44)
    emb, b, hw = 8, 2, 4
    maps = [rng.randn(b, hw, hw, emb).astype(np.float32) for _ in range(4)]
    clss = [rng.randn(b, emb).astype(np.float32) for _ in range(4)]
    ppc = (4, 6, 8, 10)
    head = HEADS.get('DPTHead')(
        in_channels=[emb] * 4, channels=6, embed_dims=emb,
        post_process_channels=ppc, readout_type='project',
        input_transform='multiple_select', in_index=(0, 1, 2, 3),
        num_classes=3, dropout_ratio=0.0, norm_cfg=BN, loss_decode=LOSS)
    inputs = [(jnp.asarray(m), jnp.asarray(c)) for m, c in zip(maps, clss)]
    fv, got = _run(head, inputs)

    def reassemble(i):
        x = t(maps[i].transpose(0, 3, 1, 2))
        fs = x.shape
        xt = x.flatten(2).permute(0, 2, 1)
        readout = t(clss[i]).unsqueeze(1).expand_as(xt)
        xt = F.gelu(_b1.linear(torch.cat((xt, readout), -1), fv,
                               f'reassemble_blocks/readout_projects_{i}'))
        x = xt.permute(0, 2, 1).reshape(fs)
        x = conv(x, fv, f'reassemble_blocks/projects_{i}')
        if i in (0, 1):
            stride = 4 if i == 0 else 2
            # flax ConvTranspose kernel (kh, kw, in, out) scatters the
            # kernel unflipped; torch's op is the conv gradient (flips) —
            # torch weight (in, out, kh, kw) = spatially FLIPPED flax kernel
            w = t(np.ascontiguousarray(
                fv[f'params/reassemble_blocks/resize_layers_{i}/kernel']
                [::-1, ::-1].transpose(2, 3, 0, 1)))
            bias = t(fv[f'params/reassemble_blocks/resize_layers_{i}'
                        f'/bias'])
            x = F.conv_transpose2d(x, w, bias, stride=stride)
        elif i == 3:
            w = t(fv['params/reassemble_blocks/resize_layers_3/conv/kernel']
                  .transpose(3, 2, 0, 1))
            bias = t(fv['params/reassemble_blocks/resize_layers_3/conv'
                        '/bias'])
            x = F.conv2d(x, w, bias, stride=2, padding=1)
        return x

    xs = []
    for i in range(4):
        f = reassemble(i)
        w = t(fv[f'params/convs_{i}/conv_m/conv/kernel']
              .transpose(3, 2, 0, 1))
        xs.append(F.conv2d(f, w, None, padding=1))  # bias=False, no norm
    out = _fusion_block(xs[-1], fv, 'fusion_blocks_0')
    for i in range(1, 4):
        out = _fusion_block(out, fv, f'fusion_blocks_{i}', xs[-(i + 1)])
    out = cm(out, fv, 'project', padding=1)
    _cmp(got, conv(out, fv, 'conv_seg'))
