"""Torch-oracle forward goldens, batch 4: K-Net (IterativeDecodeHead /
KernelUpdateHead / KernelUpdator) — the full reference pipeline: seed
kernels = the generate head's conv_seg weights, mask-pooled group features,
the gated kernel updator INCLUDING the row-split reshape quirk (updator
in_channels = half the kernel dim), kernel self-attention (torch MHA
parameterization), mmcv-style FFN with residual, mask FC stack, and
per-sample dynamic-conv mask re-prediction.

Same protocol as batches 1-3 (reference: knet_head.py:16-457).
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


def _ln(x, fv, name):
    w = t(fv[f'params/{name}/scale'])
    b = t(fv[f'params/{name}/bias'])
    return F.layer_norm(x, (x.shape[-1],), w, b, eps=1e-5)


def _dense(x, fv, name):
    w = t(fv[f'params/{name}/kernel'])  # (in, out)
    out = x @ w
    b = fv.get(f'params/{name}/bias')
    return out + t(b) if b is not None else out


def _kernel_updator(update_feature, input_feature, fv, prefix, in_c, feat):
    """reference knet_head.py:82-139, reshapes verbatim."""
    uf = update_feature.reshape(-1, in_c)
    rows = uf.shape[0]
    parameters = _dense(uf, fv, f'{prefix}/dynamic_layer')
    param_in, param_out = parameters[:, :feat], parameters[:, feat:]
    input_feats = _dense(input_feature.reshape(rows, -1, feat), fv,
                         f'{prefix}/input_layer')
    input_in = input_feats[..., :feat]
    input_out = input_feats[..., feat:]
    gate_feats = input_in * param_in.unsqueeze(-2)
    input_gate = _ln(_dense(gate_feats, fv, f'{prefix}/input_gate'), fv,
                     f'{prefix}/input_norm_in').sigmoid()
    update_gate = _ln(_dense(gate_feats, fv, f'{prefix}/update_gate'), fv,
                      f'{prefix}/norm_in').sigmoid()
    param_out = _ln(param_out, fv, f'{prefix}/norm_out')
    input_out = _ln(input_out, fv, f'{prefix}/input_norm_out')
    features = update_gate * param_out.unsqueeze(-2) + \
        input_gate * input_out
    features = _ln(_dense(features, fv, f'{prefix}/fc_layer'), fv,
                   f'{prefix}/fc_norm')
    return F.relu(features)


def _torch_mha(x, fv, prefix, num_heads):
    """torch nn.MultiheadAttention math with packed in_proj. x (B, N, E)."""
    e = x.shape[-1]
    in_w = t(fv[f'params/{prefix}/in_proj_weight'])  # (3E, E)
    in_b = t(fv[f'params/{prefix}/in_proj_bias'])
    q = x @ in_w[:e].T + in_b[:e]
    k = x @ in_w[e:2 * e].T + in_b[e:2 * e]
    v = x @ in_w[2 * e:].T + in_b[2 * e:]
    b, n = q.shape[:2]
    hd = e // num_heads
    q = q.reshape(b, n, num_heads, hd).permute(0, 2, 1, 3)
    k = k.reshape(b, n, num_heads, hd).permute(0, 2, 1, 3)
    v = v.reshape(b, n, num_heads, hd).permute(0, 2, 1, 3)
    att = F.softmax(q @ k.transpose(-1, -2) / hd ** 0.5, dim=-1)
    out = (att @ v).permute(0, 2, 1, 3).reshape(b, n, e)
    return _dense(out, fv, f'{prefix}/out_proj/linear')


def _kernel_update_head(x, kernels, masks, fv, prefix, *, num_heads,
                        ffn_ch, num_mask_fcs, upd_in, upd_feat):
    """reference KernelUpdateHead.forward, K=1, strides 1. NCHW in/out:
    x (B, C, H, W), kernels (B, N, C), masks (B, N, H, W)."""
    b, c, h, w = x.shape
    n = kernels.shape[1]
    x = conv(x, fv, f'{prefix}/feat_transform/conv_m')
    sigmoid_masks = masks.view(b, n, -1).softmax(dim=1).view(b, n, h, w)
    x_feat = torch.einsum('bnhw,bchw->bnc', sigmoid_masks, x)
    obj = _kernel_updator(x_feat, kernels.unsqueeze(2), fv,
                          f'{prefix}/kernel_update_conv', upd_in, upd_feat)
    obj = obj.reshape(b, n, -1)
    obj = _ln(obj + _torch_mha(obj, fv, f'{prefix}/attention', num_heads),
              fv, f'{prefix}/attention_norm')
    # FFN (num_ffn_fcs=2) + residual, then norm
    y = F.relu(_dense(obj, fv, f'{prefix}/ffn_layers_0'))
    y = _dense(y, fv, f'{prefix}/ffn_out')
    obj = _ln(obj + y, fv, f'{prefix}/ffn_norm')
    mask_feat = obj
    for i in range(num_mask_fcs):
        mask_feat = F.relu(_ln(
            _dense(mask_feat, fv, f'{prefix}/mask_fcs_{i}'), fv,
            f'{prefix}/mask_fcs_{i}_norm'))
    mask_feat = _dense(mask_feat, fv, f'{prefix}/fc_mask')  # (B, N, C)
    new_masks = torch.einsum('bnc,bchw->bnhw', mask_feat, x)
    return new_masks, obj


def test_knet_iterative_head_oracle():
    rng = np.random.RandomState(30)
    x_np = rng.randn(2, 8, 8, 16).astype(np.float32)
    chan, ncls = 12, 5
    head = HEADS.get('IterativeDecodeHead')(
        num_stages=2, num_classes=ncls, in_channels=16, channels=chan,
        kernel_generate_head=dict(
            type='FCNHead', in_channels=16, in_index=0, channels=chan,
            num_convs=1, concat_input=False, num_classes=ncls,
            dropout_ratio=0.0, norm_cfg=BN, loss_decode=LOSS),
        kernel_update_head=[dict(
            type='KernelUpdateHead', num_classes=ncls, num_heads=2,
            num_mask_fcs=1, in_channels=chan, out_channels=chan,
            feedforward_channels=16,
            feat_transform_cfg=dict(act_cfg=None),
            # updator in = feat = chan/2: exercises the reference's
            # row-split reshape (each 12-d kernel updates as two 6-d rows)
            kernel_updator_cfg=dict(
                type='KernelUpdator', in_channels=chan // 2,
                feat_channels=chan // 2, out_channels=chan // 2))
            for _ in range(2)],
        loss_decode=LOSS)
    fv, got = _run(head, [jnp.asarray(x_np)])

    x = t(x_np.transpose(0, 3, 1, 2))
    feats = cm(x, fv, 'kernel_generate_head/convs_0', padding=1)
    sem_seg = conv(feats, fv, 'kernel_generate_head/conv_seg')
    w = t(fv['params/kernel_generate_head/conv_seg/conv/kernel'])
    # HWIO (1,1,C,N) → (N, C), expand batch
    kernels = w[0, 0].T[None].expand(2, -1, -1).contiguous()
    masks = sem_seg
    for i in range(2):
        masks, kernels = _kernel_update_head(
            feats, kernels, masks, fv, f'kernel_update_head_{i}',
            num_heads=2, ffn_ch=16, num_mask_fcs=1,
            upd_in=chan // 2, upd_feat=chan // 2)
    _cmp(got, masks)
