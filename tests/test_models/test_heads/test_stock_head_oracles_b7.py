"""Torch-oracle goldens, batch 7: the author's TransUNet monolithic model
(reference ``decode_heads/transunet_head.py`` + ``decode_heads/vit.py``) —
ResNet-ish bottleneck encoder, the quirky ViT (energy MULTIPLIED by
sqrt(head_dim), post-LN blocks, band-major patchify, learned pos-embed
added after the cls concat), and the skip-concat decoder.

Same protocol as batches 1-6.
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
t, conv, bn, _run, _cmp = _b1.t, _b1.conv, _b1.bn, _b1._run, _b1._cmp


def _dense(x, fv, name):
    out = x @ t(fv[f'params/{name}/kernel'])
    b = fv.get(f'params/{name}/bias')
    return out + t(b) if b is not None else out


def _ln(x, fv, name):
    return F.layer_norm(x, (x.shape[-1],), t(fv[f'params/{name}/scale']),
                        t(fv[f'params/{name}/bias']), eps=1e-5)


def _enc_bottleneck(x, fv, p):
    # downsample conv carries the stride
    w = t(fv[f'params/{p}/downsample_0/conv/kernel'].transpose(3, 2, 0, 1))
    down = F.batch_norm(
        F.conv2d(x, w, None, stride=2),
        t(fv[f'batch_stats/{p}/downsample_1/mean']),
        t(fv[f'batch_stats/{p}/downsample_1/var']),
        t(fv[f'params/{p}/downsample_1/scale']),
        t(fv[f'params/{p}/downsample_1/bias']), training=False, eps=1e-5)
    y = F.relu(bn(conv(x, fv, f'{p}/conv1'), fv, f'{p}/norm1'))
    w2 = t(fv[f'params/{p}/conv2/conv/kernel'].transpose(3, 2, 0, 1))
    y = F.relu(F.batch_norm(
        F.conv2d(y, w2, None, stride=2, padding=1),
        t(fv[f'batch_stats/{p}/norm2/mean']),
        t(fv[f'batch_stats/{p}/norm2/var']),
        t(fv[f'params/{p}/norm2/scale']),
        t(fv[f'params/{p}/norm2/bias']), training=False, eps=1e-5))
    y = bn(conv(y, fv, f'{p}/conv3'), fv, f'{p}/norm3')
    return F.relu(y + down)


def _vit(x, fv, head_num, block_num):
    """reference vit.py with patch_dim=1: tokens = HW pixels."""
    b, c, h, w = x.shape
    tokens = x.flatten(2).permute(0, 2, 1)  # (b, hw, c) row-major == ours
    proj = _dense(tokens, fv, 'vit/projection')
    cls = t(fv['params/vit/cls_token']).expand(b, -1, -1)
    xs = torch.cat([cls, proj], dim=1)
    emb = t(fv['params/vit/embedding'])
    xs = xs + emb[:xs.shape[1]]
    e = xs.shape[-1]
    hd = e // head_num
    dk = hd ** 0.5
    for i in range(block_num):
        p = f'vit/layer_blocks_{i}'
        qkv = _dense(xs, fv, f'{p}/multi_head_attention/qkv_layer')
        bt, tt = qkv.shape[:2]
        # reference rearrange 'b t (d k h) -> k b h t d'
        qkv = qkv.reshape(bt, tt, hd, 3, head_num).permute(3, 0, 4, 1, 2)
        q, k, v = qkv[0], qkv[1], qkv[2]
        energy = torch.einsum('bhid,bhjd->bhij', q, k) * dk  # quirk: MUL
        att = torch.softmax(energy, dim=-1)
        out = torch.einsum('bhij,bhjd->bhid', att, v)
        out = out.permute(0, 2, 1, 3).reshape(bt, tt, e)
        out = _dense(out, fv, f'{p}/multi_head_attention/out_attention')
        xs = _ln(xs + out, fv, f'{p}/layer_norm1')
        m = F.gelu(_dense(xs, fv, f'{p}/mlp/fc1'))
        m = _dense(m, fv, f'{p}/mlp/fc2')
        xs = _ln(xs + m, fv, f'{p}/layer_norm2')
    return xs[:, 1:]


def _dec_bottleneck(x, fv, p, skip=None):
    x = F.interpolate(x, scale_factor=2, mode='bilinear',
                      align_corners=True)
    if skip is not None:
        x = torch.cat([skip, x], dim=1)
    x = F.relu(bn(conv(x, fv, f'{p}/layer_0', padding=1), fv,
                  f'{p}/layer_1'))
    x = F.relu(bn(conv(x, fv, f'{p}/layer_3', padding=1), fv,
                  f'{p}/layer_4'))
    return x


def test_transunet_oracle():
    rng = np.random.RandomState(60)
    img = rng.randn(1, 32, 32, 3).astype(np.float32)
    oc, heads, blocks = 8, 2, 2
    head = HEADS.get('TransUNet')(
        img_dim=32, in_channels=3, out_channels=oc, head_num=heads,
        mlp_dim=16, block_num=blocks, patch_dim=16, class_num=3,
        loss_decode=LOSS)
    fv, got = _run(head, jnp.asarray(img))

    x = t(img.transpose(0, 3, 1, 2))
    w = t(fv['params/conv1/conv/kernel'].transpose(3, 2, 0, 1))
    x = F.conv2d(x, w, None, stride=2, padding=3)
    x1 = F.relu(bn(x, fv, 'norm1'))
    x2 = _enc_bottleneck(x1, fv, 'encoder1')
    x3 = _enc_bottleneck(x2, fv, 'encoder2')
    x = _enc_bottleneck(x3, fv, 'encoder3')
    vt = _vit(x, fv, heads, blocks)
    side = x.shape[-1]
    x = vt.permute(0, 2, 1).reshape(1, -1, side, side)
    x = F.relu(bn(conv(x, fv, 'conv2', padding=1), fv, 'norm2'))
    x = _dec_bottleneck(x, fv, 'decoder1', x3)
    x = _dec_bottleneck(x, fv, 'decoder2', x2)
    x = _dec_bottleneck(x, fv, 'decoder3', x1)
    x = _dec_bottleneck(x, fv, 'decoder4')
    expected = conv(x, fv, 'conv_out')
    _cmp(got, expected)


# ---------------------------------------------------------------------------
# SwinUNet / SwinTransformerSys (reference swinunet_head.py:597)
# ---------------------------------------------------------------------------
def _win_partition(x, ws):
    B, H, W, C = x.shape
    x = x.view(B, H // ws, ws, W // ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)


def _win_reverse(win, ws, H, W):
    B = win.shape[0] // (H * W // ws // ws)
    x = win.view(B, H // ws, W // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def _rel_index(ws):
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing='ij')).reshape(2, -1)
    rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0)
    rel[..., 0] += ws - 1
    rel[..., 1] += ws - 1
    rel[..., 0] *= 2 * ws - 1
    return rel.sum(-1)


def _swin_mask(H, W, ws, shift):
    if shift == 0:
        return None
    img = np.zeros((1, H, W, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift),
                    slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    mw = _win_partition(torch.from_numpy(img), ws).reshape(-1, ws * ws)
    am = mw.unsqueeze(1) - mw.unsqueeze(2)
    return torch.where(am != 0, torch.tensor(-100.0), torch.tensor(0.0))


def _swin_block(x, fv, p, res, heads, ws, shift):
    H, W = res
    if min(res) <= ws:
        shift, ws = 0, min(res)
    B, L, C = x.shape
    shortcut = x
    x = _ln(x, fv, f'{p}/norm1').view(B, H, W, C)
    if shift > 0:
        x = torch.roll(x, (-shift, -shift), dims=(1, 2))
    xw = _win_partition(x, ws).reshape(-1, ws * ws, C)
    # window attention
    hd = C // heads
    qkv = _dense(xw, fv, f'{p}/attn/qkv')
    B_, N = qkv.shape[:2]
    qkv = qkv.reshape(B_, N, 3, heads, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
    attn = q @ k.transpose(-2, -1)
    table = t(fv[f'params/{p}/attn/relative_position_bias_table'])
    bias = table[torch.from_numpy(_rel_index(ws)).reshape(-1)].reshape(
        ws * ws, ws * ws, heads).permute(2, 0, 1)
    attn = attn + bias.unsqueeze(0)
    mask = _swin_mask(H, W, ws, shift)
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.view(B_ // nW, nW, heads, N, N) + \
            mask.unsqueeze(1).unsqueeze(0)
        attn = attn.view(-1, heads, N, N)
    attn = torch.softmax(attn, dim=-1)
    xw = (attn @ v).transpose(1, 2).reshape(B_, N, C)
    xw = _dense(xw, fv, f'{p}/attn/proj')
    x = _win_reverse(xw.view(-1, ws, ws, C), ws, H, W)
    if shift > 0:
        x = torch.roll(x, (shift, shift), dims=(1, 2))
    x = shortcut + x.reshape(B, L, C)
    y = _ln(x, fv, f'{p}/norm2')
    y = F.gelu(_dense(y, fv, f'{p}/mlp/fc1'))
    y = _dense(y, fv, f'{p}/mlp/fc2')
    return x + y


def _patch_merge(x, fv, p, res):
    H, W = res
    B, L, C = x.shape
    x = x.view(B, H, W, C)
    x = torch.cat([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                   x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1)
    x = x.view(B, -1, 4 * C)
    x = _ln(x, fv, f'{p}/norm')
    return _dense(x, fv, f'{p}/reduction')


def _patch_expand(x, fv, p, res, scale=2):
    H, W = res
    if scale in (2, 4):  # FinalPatchExpand_X4 always expands (16*dim)
        x = _dense(x, fv, f'{p}/expand')
    B, L, C = x.shape
    x = x.view(B, H, W, scale, scale, C // scale ** 2)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(B, H * scale * W * scale,
                                            C // scale ** 2)
    return _ln(x, fv, f'{p}/norm')


def test_swinunet_sys_oracle():
    """SwinTransformerSys forward with 3 stages incl. a shifted block, the
    window-clamp guard at the bottleneck, patch merge/expand reshapes, skip
    concat order, and the final 4x expand."""
    from stc_unet_tpu.models.decode_heads.swinunet_head import \
        SwinTransformerSys
    import jax
    rng = np.random.RandomState(61)
    img = rng.randn(1, 16, 16, 3).astype(np.float32)
    depths, heads, ws, emb = (1, 2, 1), (2, 2, 2), 4, 8
    mod = SwinTransformerSys(
        img_size=16, patch_size=2, num_classes=5, embed_dim=emb,
        depths=depths, num_heads=heads, window_size=ws, mlp_ratio=2.0,
        drop_path_rate=0.0)
    variables = mod.init({'params': jax.random.PRNGKey(0),
                          'dropout': jax.random.PRNGKey(1)},
                         jnp.asarray(img), train=False)
    variables = _b1._randomize(variables, 61)
    got = mod.apply(variables, jnp.asarray(img), train=False)
    fv = _b1._flat(variables)

    pr = 8
    x = t(img.transpose(0, 3, 1, 2))
    w = t(fv['params/patch_embed/proj/kernel'].transpose(3, 2, 0, 1))
    b_ = t(fv['params/patch_embed/proj/bias'])
    x = F.conv2d(x, w, b_, stride=2)
    B, C = x.shape[:2]
    x = x.flatten(2).permute(0, 2, 1)
    x = _ln(x, fv, 'patch_embed/norm')

    skips = []
    for i, d in enumerate(depths):
        skips.append(x)
        res = (pr // 2 ** i, pr // 2 ** i)
        dim = emb * 2 ** i
        for j in range(d):
            x = _swin_block(x, fv, f'layers_{i}/blocks_{j}', res, heads[i],
                            ws, 0 if j % 2 == 0 else ws // 2)
        if i < len(depths) - 1:
            x = _patch_merge(x, fv, f'layers_{i}/downsample', res)
    x = _ln(x, fv, 'norm')

    nl = len(depths)
    for inx in range(nl):
        kk = nl - 1 - inx
        res = (pr // 2 ** kk, pr // 2 ** kk)
        dim = emb * 2 ** kk
        if inx == 0:
            x = _patch_expand(x, fv, 'layers_up_0', res)
        else:
            x = torch.cat([x, skips[kk]], -1)
            x = _dense(x, fv, f'concat_back_dim_{inx}')
            for j in range(depths[kk]):
                x = _swin_block(x, fv, f'layers_up_{inx}/blocks_{j}', res,
                                heads[kk], ws,
                                0 if j % 2 == 0 else ws // 2)
            if inx < nl - 1:
                x = _patch_expand(x, fv, f'layers_up_{inx}/upsample', res)
    x = _ln(x, fv, 'norm_up')
    x = _patch_expand(x, fv, 'up', (pr, pr), scale=4)
    x = x.view(1, 4 * pr, 4 * pr, emb).permute(0, 3, 1, 2)
    wout = t(fv['params/output/kernel'].transpose(3, 2, 0, 1))
    expected = F.conv2d(x, wout)
    _cmp(got, expected)
