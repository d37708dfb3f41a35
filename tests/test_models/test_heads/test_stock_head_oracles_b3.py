"""Torch-oracle forward goldens, batch 3: CCHead (mmcv CrissCrossAttention
recurrence, -inf column diagonal) and PointHead (PointRend: grid_sample
zero-padding point sampling, MLP with per-layer coarse concat, iterative
subdivision refinement sampling coarse feats from the ORIGINAL prev
output).

Same protocol as batch 1/2.
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


# ---------------------------------------------------------------------------
# CCHead (mmcv CrissCrossAttention: row+col attention, -inf col diagonal,
# zero-init residual scale, applied `recurrence` times with SHARED weights)
# ---------------------------------------------------------------------------
def _cca_expected(x, fv, prefix, gamma):
    """mmcv CrissCrossAttention forward (pure-torch formulation)."""
    b, c, h, w = x.shape
    q = conv(x, fv, f'{prefix}/query_conv')
    k = conv(x, fv, f'{prefix}/key_conv')
    v = conv(x, fv, f'{prefix}/value_conv')
    neg_diag = torch.diag(torch.full((h,), float('-inf')))
    energy_h = (torch.einsum('bchw,bciw->bwhi', q, k)
                + neg_diag).transpose(1, 2)           # (b, h, w, H)
    energy_w = torch.einsum('bchw,bchj->bhwj', q, k)  # (b, h, w, W)
    attn = F.softmax(torch.cat([energy_h, energy_w], dim=-1), dim=-1)
    a_col, a_row = attn[..., :h], attn[..., h:]
    out = torch.einsum('bciw,bhwi->bchw', v, a_col) + \
        torch.einsum('bchj,bhwj->bchw', v, a_row)
    return gamma * out + x


def test_cc_head_oracle():
    rng = np.random.RandomState(20)
    x_np = rng.randn(2, 6, 5, 8).astype(np.float32)  # H != W on purpose
    head = HEADS.get('CCHead')(
        in_channels=8, channels=8, recurrence=2, num_classes=3,
        in_index=0, dropout_ratio=0.0, norm_cfg=BN, loss_decode=LOSS)
    fv, got = _run(head, [jnp.asarray(x_np)])
    x = t(x_np.transpose(0, 3, 1, 2))
    out = cm(x, fv, 'convs_0', padding=1)
    gamma = float(fv['params/cca/gamma'])
    for _ in range(2):
        out = _cca_expected(out, fv, 'cca', gamma)
    out = cm(out, fv, 'convs_1', padding=1)
    out = cm(torch.cat([x, out], 1), fv, 'conv_cat', padding=1)
    _cmp(got, conv(out, fv, 'conv_seg'))


# ---------------------------------------------------------------------------
# PointHead (PointRend)
# ---------------------------------------------------------------------------
def _torch_point_sample(feats, points, align_corners=False, mode='bilinear'):
    """mmcv point_sample: [0,1] coords → grid_sample (zeros padding)."""
    grid = 2.0 * points - 1.0
    out = F.grid_sample(feats, grid.unsqueeze(2), mode=mode,
                        padding_mode='zeros', align_corners=align_corners)
    return out.squeeze(3)  # (B, C, P)


def _torch_point_mlp(fine, coarse, fv, num_fcs, coarse_each_layer):
    """fine/coarse (B, C, P); fcs are Dense (our layout (in,out))."""
    x = torch.cat([fine, coarse], dim=1)
    for i in range(num_fcs):
        w = t(fv[f'params/fcs_{i}/kernel'])       # (in, out)
        b = t(fv[f'params/fcs_{i}/bias'])
        x = torch.einsum('bcp,co->bop', x, w) + b[None, :, None]
        x = F.relu(x)
        if coarse_each_layer:
            x = torch.cat([x, coarse], dim=1)
    w = t(fv['params/fc_seg/kernel'])
    b = t(fv['params/fc_seg/bias'])
    return torch.einsum('bcp,co->bop', x, w) + b[None, :, None]


def test_point_head_forward_oracle():
    """Explicit points (incl. edge points outside the half-pixel band —
    grid_sample zero-padding semantics) through the point MLP."""
    rng = np.random.RandomState(21)
    x0 = rng.randn(2, 8, 8, 4).astype(np.float32)
    prev = rng.randn(2, 8, 8, 3).astype(np.float32)
    # points: interior + exact corners/edges (exercise zero padding)
    pts = np.concatenate([
        rng.rand(2, 12, 2),
        np.tile(np.array([[0.0, 0.0], [1.0, 1.0], [0.0, 1.0],
                          [0.03, 0.97]], np.float32), (2, 1, 1)),
    ], axis=1).astype(np.float32)
    head = HEADS.get('PointHead')(
        in_channels=[4], channels=6, num_fcs=3, num_classes=3,
        in_index=(0,), dropout_ratio=0.0, loss_decode=LOSS)
    rngs = {'params': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(1)}
    args = ([jnp.asarray(x0)], jnp.asarray(prev))
    variables = head.init(rngs, *args, train=False,
                          points=jnp.asarray(pts))
    variables = _b1._randomize(variables, 21)
    got = head.apply(variables, *args, train=False,
                     points=jnp.asarray(pts))
    fv = _b1._flat(variables)
    logits, _ = got
    fine = _torch_point_sample(t(x0.transpose(0, 3, 1, 2)), t(pts))
    coarse = _torch_point_sample(t(prev.transpose(0, 3, 1, 2)), t(pts))
    expected = _torch_point_mlp(fine, coarse, fv, 3, True)  # (B, K, P)
    np.testing.assert_allclose(
        np.asarray(logits, np.float32).transpose(0, 2, 1),
        expected.numpy(), rtol=1e-4, atol=1e-4)


def test_point_head_eval_subdivision_oracle():
    """Full reference forward_test: resize → top-N uncertain → MLP →
    scatter, with coarse feats from the ORIGINAL prev_output."""
    rng = np.random.RandomState(22)
    x0 = rng.randn(1, 8, 8, 4).astype(np.float32)
    prev = rng.randn(1, 8, 8, 3).astype(np.float32)
    head = HEADS.get('PointHead')(
        in_channels=[4], channels=6, num_fcs=2, num_classes=3,
        in_index=(0,), dropout_ratio=0.0, scale_factor=2,
        subdivision_steps=2, subdivision_num_points=16, loss_decode=LOSS)
    fv, got = _run(head, [jnp.asarray(x0)], extra=jnp.asarray(prev))

    x_t = t(x0.transpose(0, 3, 1, 2))
    prev_t = t(prev.transpose(0, 3, 1, 2))
    refined = prev_t.clone()
    for _ in range(2):
        refined = F.interpolate(refined, scale_factor=2, mode='bilinear',
                                align_corners=False)
        b, ch, hh, ww = refined.shape
        top2 = torch.topk(refined, k=2, dim=1)[0]
        unc = (top2[:, 1] - top2[:, 0]).view(b, hh * ww)
        n = min(16, hh * ww)
        point_indices = unc.topk(n, dim=1)[1]
        pc = torch.zeros(b, n, 2)
        pc[:, :, 0] = 0.5 / ww + (point_indices % ww).float() / ww
        pc[:, :, 1] = 0.5 / hh + (point_indices // ww).float() / hh
        fine = _torch_point_sample(x_t, pc)
        coarse = _torch_point_sample(prev_t, pc)
        logits = _torch_point_mlp(fine, coarse, fv, 2, True)
        refined = refined.reshape(b, ch, hh * ww).scatter(
            2, point_indices.unsqueeze(1).expand(-1, ch, -1), logits)
        refined = refined.view(b, ch, hh, ww)
    _cmp(got, refined)
