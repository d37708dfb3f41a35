"""Full-forward torch-oracle value goldens for the numerically tricky stock
heads (VERDICT r3 #3): EMAHead (EM iteration, reference ``ema_head.py:169``),
PSAHead (PSAMask collection, ``psa_head.py:197``), EncHead + Encoding
(``ops/encoding.py:7``), DNLHead (whitened NL + unary), OCRHead (spatial
gather + object attention), DAHead (PAM/CAM), ANNHead (AFNB/APNB pyramid
keys).

Protocol: build the flax head, randomize every param/batch-stat leaf
deterministically, re-run the reference's math re-implemented in plain torch
(functional NCHW, ConvModule ≙ conv+BN(eval)+ReLU) on the SAME weights, and
require forward parity at rtol 1e-4. A wrong normalization constant,
softmax axis, or pool ordering in any of these heads fails here where shape
tests cannot.
"""
import flax
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
from flax import traverse_util

from stc_unet_tpu.models.builder import HEADS

BN = dict(type='BN')
LOSS = dict(type='CrossEntropyLoss')


# ---------------------------------------------------------------------------
# weight plumbing
# ---------------------------------------------------------------------------
def _randomize(variables, seed=0):
    """Replace every leaf with seeded values. Scales are chosen so the
    activation statistics stay healthy (fan-in-scaled weights, BN affine
    near identity) — with crude N(0, 0.3) weights the ReLU'd projections
    die and attention softmaxes collapse to uniform, making the oracle
    comparison non-discriminating (any key/value bug would still 'pass')."""
    flat = traverse_util.flatten_dict(flax.core.unfreeze(variables))
    rng = np.random.RandomState(seed)
    out = {}
    for path in sorted(flat.keys()):
        shape = flat[path].shape
        if path[-1] == 'var':
            val = rng.uniform(0.7, 1.3, shape)
        elif path[-1] == 'mean':
            val = rng.uniform(-0.3, 0.3, shape)
        elif path[-1] == 'scale' and len(shape) == 1 and any(
                p == 'bn' or 'norm' in p for p in path[:-1]):
            val = rng.uniform(0.8, 1.2, shape)
        elif path[-1] == 'kernel' and len(shape) == 4:   # conv HWIO
            fan_in = shape[0] * shape[1] * shape[2]
            val = rng.randn(*shape) * (2.0 / fan_in) ** 0.5
        elif path[-1] == 'kernel' and len(shape) == 2:   # dense (in, out)
            val = rng.randn(*shape) * (2.0 / shape[0]) ** 0.5
        elif path[-1] == 'bias':
            val = rng.uniform(-0.1, 0.1, shape)
        else:
            val = rng.randn(*shape) * 0.5
        out[path] = jnp.asarray(val, jnp.float32)
    return traverse_util.unflatten_dict(out)


def _flat(variables):
    return {'/'.join(k): np.asarray(v, np.float32) for k, v in
            traverse_util.flatten_dict(flax.core.unfreeze(variables)).items()}


def t(a):
    return torch.from_numpy(np.ascontiguousarray(a))


def conv(x, fv, name, padding=0, prefix='params'):
    """Plain conv (bias if present): flax HWIO → torch OIHW."""
    w = t(fv[f'{prefix}/{name}/conv/kernel'].transpose(3, 2, 0, 1))
    b = fv.get(f'{prefix}/{name}/conv/bias')
    return F.conv2d(x, w, t(b) if b is not None else None, padding=padding)


def bn(x, fv, name):
    return F.batch_norm(
        x, t(fv[f'batch_stats/{name}/mean']), t(fv[f'batch_stats/{name}/var']),
        t(fv[f'params/{name}/scale']), t(fv[f'params/{name}/bias']),
        training=False, eps=1e-5)


def cm(x, fv, name, padding=0, act=True, norm=True):
    """ConvModule ≙ conv(+BN eval)(+ReLU)."""
    w = t(fv[f'params/{name}/conv_m/conv/kernel'].transpose(3, 2, 0, 1))
    b = fv.get(f'params/{name}/conv_m/conv/bias')
    x = F.conv2d(x, w, t(b) if b is not None else None, padding=padding)
    if norm:
        x = bn(x, fv, f'{name}/bn')
    return F.relu(x) if act else x


def linear(x, fv, name):
    w = t(fv[f'params/{name}/linear/kernel'])  # (in, out)
    b = t(fv[f'params/{name}/linear/bias'])
    return x @ w + b


def _run(head, inputs, extra=None, seed=0):
    rngs = {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)}
    args = (inputs,) if extra is None else (inputs, extra)
    variables = head.init(rngs, *args, train=False)
    variables = _randomize(variables, seed)
    out = head.apply(variables, *args, train=False)
    return _flat(variables), out


def _cmp(got_nhwc, expected_nchw, rtol=1e-4, atol=1e-4):
    got = np.asarray(got_nhwc, np.float32).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, expected_nchw.numpy(), rtol=rtol,
                               atol=atol)


# ---------------------------------------------------------------------------
# EMAHead (reference ema_head.py:169)
# ---------------------------------------------------------------------------
def test_ema_head_oracle():
    rng = np.random.RandomState(0)
    x_np = rng.randn(2, 8, 8, 8).astype(np.float32)  # NHWC
    head = HEADS.get('EMAHead')(
        in_channels=8, channels=6, ema_channels=8, num_bases=4, num_stages=3,
        num_classes=3, in_index=0, dropout_ratio=0.0, norm_cfg=BN,
        loss_decode=LOSS)
    fv, got = _run(head, [jnp.asarray(x_np)])

    x = t(x_np.transpose(0, 3, 1, 2))
    feats = cm(x, fv, 'ema_in_conv', padding=1)
    identity = feats
    feats = cm(feats, fv, 'ema_mid_conv', act=False, norm=False)
    n, c, h, w = feats.shape
    flat = feats.view(n, c, h * w)                            # (n, c, hw)
    bases = t(fv['batch_stats/bases']).permute(0, 2, 1)       # (1, c, k)
    bases = bases.repeat(n, 1, 1)
    with torch.no_grad():
        for _ in range(3):
            attention = torch.einsum('bcn,bck->bnk', flat, bases)
            attention = F.softmax(attention, dim=2)
            attention_normed = F.normalize(attention, dim=1, p=1)
            bases = torch.einsum('bcn,bnk->bck', flat, attention_normed)
            bases = F.normalize(bases, dim=1, p=2)
    recon = torch.einsum('bck,bnk->bcn', bases, attention).view(n, c, h, w)
    recon = F.relu(recon)
    recon = cm(recon, fv, 'ema_out_conv', act=False)
    output = F.relu(identity + recon)
    output = cm(output, fv, 'bottleneck', padding=1)
    output = cm(torch.cat([x, output], 1), fv, 'conv_cat', padding=1)
    expected = conv(output, fv, 'conv_seg')
    _cmp(got, expected)


# ---------------------------------------------------------------------------
# PSAHead (reference psa_head.py:197; PSAMask ≙ mmcv ops/psamask)
# ---------------------------------------------------------------------------
def _psamask_torch(inp, psa_type, mask_size):
    """mmcv PSAMask loop semantics: place each position's (hm, wm) local
    window into the global (H*W) channel axis, zero outside."""
    n, _, h, w = inp.shape
    hm, wm = mask_size
    half_h, half_w = (hm - 1) // 2, (wm - 1) // 2
    out = torch.zeros(n, h * w, h, w)
    for hh in range(h):
        for ww in range(w):
            for hidx in range(hm):
                for widx in range(wm):
                    ph, pw = hidx + hh - half_h, widx + ww - half_w
                    if 0 <= ph < h and 0 <= pw < w:
                        v = inp[:, hidx * wm + widx, hh, ww]
                        if psa_type == 'collect':
                            out[:, ph * w + pw, hh, ww] = v
                        else:  # distribute: channel = owner, spatial = target
                            out[:, hh * w + ww, ph, pw] = v
    return out


def test_psa_head_oracle_bidirection():
    rng = np.random.RandomState(1)
    x_np = rng.randn(2, 8, 8, 8).astype(np.float32)
    mask_size = (3, 3)
    head = HEADS.get('PSAHead')(
        in_channels=8, channels=6, mask_size=mask_size,
        psa_type='bi-direction', compact=False, shrink_factor=2,
        normalization_factor=1.0, psa_softmax=True, num_classes=3,
        in_index=0, dropout_ratio=0.0, norm_cfg=BN, loss_decode=LOSS)
    fv, got = _run(head, [jnp.asarray(x_np)])

    x = t(x_np.transpose(0, 3, 1, 2))
    identity = x

    def attention(feat, name):
        y = cm(feat, fv, f'{name}_0')
        w = t(fv[f'params/{name}_1/conv/kernel'].transpose(3, 2, 0, 1))
        return F.conv2d(y, w)  # bias-free (reference nn.Conv2d(bias=False))

    x_col = cm(x, fv, 'reduce')
    x_dis = cm(x, fv, 'reduce_p')
    # 8 % 2 == 0 → h=w=4, align_corners=False (reference :152-170)
    x_col = F.interpolate(x_col, size=(4, 4), mode='bilinear',
                          align_corners=False)
    x_dis = F.interpolate(x_dis, size=(4, 4), mode='bilinear',
                          align_corners=False)
    n, c, h, w = x_col.shape
    y_col = _psamask_torch(attention(x_col, 'attention'), 'collect',
                           mask_size)
    y_dis = _psamask_torch(attention(x_dis, 'attention_p'), 'distribute',
                           mask_size)
    y_col = F.softmax(y_col, dim=1)
    y_dis = F.softmax(y_dis, dim=1)
    x_col = torch.bmm(x_col.view(n, c, h * w),
                      y_col.view(n, h * w, h * w)).view(n, c, h, w)
    x_dis = torch.bmm(x_dis.view(n, c, h * w),
                      y_dis.view(n, h * w, h * w)).view(n, c, h, w)
    out = torch.cat([x_col, x_dis], 1)
    out = cm(out, fv, 'proj', padding=1)  # reference quirk: 1x1 with pad 1
    out = F.interpolate(out, size=identity.shape[2:], mode='bilinear',
                        align_corners=False)
    out = cm(torch.cat((identity, out), 1), fv, 'bottleneck', padding=1)
    expected = conv(out, fv, 'conv_seg')
    _cmp(got, expected)


# ---------------------------------------------------------------------------
# EncHead + Encoding (reference enc_head.py, ops/encoding.py:7)
# ---------------------------------------------------------------------------
def test_enc_head_oracle():
    rng = np.random.RandomState(2)
    x0 = rng.randn(2, 8, 8, 4).astype(np.float32)
    x1 = rng.randn(2, 4, 4, 8).astype(np.float32)
    head = HEADS.get('EncHead')(
        in_channels=[4, 8], channels=6, num_codes=4, use_se_loss=True,
        add_lateral=True, num_classes=3, in_index=(0, 1), dropout_ratio=0.0,
        norm_cfg=BN, loss_decode=LOSS)
    fv, got = _run(head, [jnp.asarray(x0), jnp.asarray(x1)])
    got_seg, got_se = got

    feat = cm(t(x1.transpose(0, 3, 1, 2)), fv, 'bottleneck', padding=1)
    lateral = cm(t(x0.transpose(0, 3, 1, 2)), fv, 'lateral_convs_0')
    lateral = F.interpolate(lateral, size=(4, 4), mode='bilinear',
                            align_corners=False)
    feat = cm(torch.cat([feat, lateral], 1), fv, 'fusion', padding=1)
    proj = cm(feat, fv, 'enc_module/encoding_project')
    # Encoding (reference ops/encoding.py:33-69)
    b, c = proj.shape[:2]
    xe = proj.view(b, c, -1).transpose(1, 2).contiguous()     # (b, n, c)
    cw = t(fv['params/enc_module/encoding/codewords'])        # (k, c)
    sc = t(fv['params/enc_module/encoding/scale'])            # (k,)
    resid = xe.unsqueeze(2) - cw.view(1, 1, *cw.shape)
    sl2 = sc.view(1, 1, -1) * resid.pow(2).sum(3)
    assign = F.softmax(sl2, dim=2)
    encoded = (assign.unsqueeze(3) * resid).sum(1)            # (b, k, c)
    # nn.BatchNorm1d(num_codes) eval on (b, k, c)
    encoded = F.batch_norm(
        encoded, t(fv['batch_stats/enc_module/encoding_norm/mean']),
        t(fv['batch_stats/enc_module/encoding_norm/var']),
        t(fv['params/enc_module/encoding_norm/scale']),
        t(fv['params/enc_module/encoding_norm/bias']),
        training=False, eps=1e-5)
    encoding_feat = F.relu(encoded).mean(dim=1)               # (b, c)
    gamma = torch.sigmoid(linear(encoding_feat, fv, 'enc_module/fc'))
    y = gamma.view(b, c, 1, 1)
    output = F.relu(feat + feat * y)
    expected_seg = conv(output, fv, 'conv_seg')
    expected_se = linear(encoding_feat, fv, 'se_layer')
    _cmp(got_seg, expected_seg)
    np.testing.assert_allclose(np.asarray(got_se, np.float32),
                               expected_se.numpy(), rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# DNLHead (reference dnl_head.py:10-137 over mmcv NonLocal2d)
# ---------------------------------------------------------------------------
def test_dnl_head_oracle():
    rng = np.random.RandomState(3)
    x_np = rng.randn(2, 8, 8, 8).astype(np.float32)
    head = HEADS.get('DNLHead')(
        in_channels=8, channels=8, reduction=2, use_scale=True,
        temperature=0.05, num_classes=3, in_index=0, dropout_ratio=0.0,
        norm_cfg=BN, loss_decode=LOSS)
    fv, got = _run(head, [jnp.asarray(x_np)])

    x = t(x_np.transpose(0, 3, 1, 2))
    out = cm(x, fv, 'convs_0', padding=1)
    # DisentangledNonLocal2d
    n, c, h, w = out.shape
    inter = c // 2
    g_x = conv(out, fv, 'dnl_block/g').view(n, inter, -1).permute(0, 2, 1)
    theta = conv(out, fv, 'dnl_block/theta').view(n, inter, -1)
    theta = theta.permute(0, 2, 1)
    phi = conv(out, fv, 'dnl_block/phi').view(n, inter, -1)
    theta = theta - theta.mean(dim=-2, keepdim=True)
    phi = phi - phi.mean(dim=-1, keepdim=True)
    pw = torch.matmul(theta, phi) / float(inter) ** 0.5 / 0.05
    pw = pw.softmax(dim=-1)
    y = torch.matmul(pw, g_x).permute(0, 2, 1).reshape(n, inter, h, w)
    unary = conv(out, fv, 'dnl_block/conv_mask').view(n, 1, -1)
    unary = unary.softmax(dim=-1)
    unary_x = torch.matmul(unary, g_x).permute(0, 2, 1).reshape(
        n, inter, 1, 1)
    dnl = out + cm(y + unary_x, fv, 'dnl_block/conv_out', act=False)
    out = cm(dnl, fv, 'convs_1', padding=1)
    out = cm(torch.cat([x, out], 1), fv, 'conv_cat', padding=1)
    expected = conv(out, fv, 'conv_seg')
    _cmp(got, expected)


# ---------------------------------------------------------------------------
# OCRHead (reference ocr_head.py: SpatialGather + ObjectAttentionBlock)
# ---------------------------------------------------------------------------
def test_ocr_head_oracle():
    rng = np.random.RandomState(4)
    x_np = rng.randn(2, 8, 8, 8).astype(np.float32)
    prev_np = rng.randn(2, 8, 8, 3).astype(np.float32)
    head = HEADS.get('OCRHead')(
        in_channels=8, channels=6, ocr_channels=4, scale=1, num_classes=3,
        in_index=0, dropout_ratio=0.0, norm_cfg=BN, loss_decode=LOSS)
    fv, got = _run(head, [jnp.asarray(x_np)], extra=jnp.asarray(prev_np))

    x = t(x_np.transpose(0, 3, 1, 2))
    prev = t(prev_np.transpose(0, 3, 1, 2))
    feats = cm(x, fv, 'bottleneck', padding=1)
    # SpatialGatherModule
    b, k = prev.shape[:2]
    c = feats.shape[1]
    probs = F.softmax(1 * prev.view(b, k, -1), dim=2)
    context = torch.matmul(probs, feats.view(b, c, -1).permute(0, 2, 1))
    context = context.permute(0, 2, 1).contiguous().unsqueeze(3)  # (b,c,k,1)
    # ObjectAttentionBlock (key_query_num_convs=2 ConvModules, matmul_norm)
    oab = 'object_context_block'
    query = cm(cm(feats, fv, f'{oab}/query_project_0'), fv,
               f'{oab}/query_project_1')
    key = cm(cm(context, fv, f'{oab}/key_project_0'), fv,
             f'{oab}/key_project_1')
    value = cm(context, fv, f'{oab}/value_project_0')
    ch = query.shape[1]
    q = query.reshape(b, ch, -1).permute(0, 2, 1)
    kk = key.reshape(b, ch, -1)
    v = value.reshape(b, ch, -1).permute(0, 2, 1)
    sim = (ch ** -0.5) * torch.matmul(q, kk)
    sim = F.softmax(sim, dim=-1)
    ctx = torch.matmul(sim, v).permute(0, 2, 1).reshape(
        b, -1, *feats.shape[2:])
    ctx = cm(ctx, fv, f'{oab}/out_project_0')
    output = cm(torch.cat([ctx, feats], 1), fv, f'{oab}/bottleneck')
    expected = conv(output, fv, 'conv_seg')
    _cmp(got, expected)


# ---------------------------------------------------------------------------
# DAHead (reference da_head.py: PAM + CAM, fused logits)
# ---------------------------------------------------------------------------
def test_da_head_oracle():
    rng = np.random.RandomState(5)
    x_np = rng.randn(2, 8, 8, 8).astype(np.float32)
    head = HEADS.get('DAHead')(
        in_channels=8, channels=6, pam_channels=4, num_classes=3,
        in_index=0, dropout_ratio=0.0, norm_cfg=BN, loss_decode=LOSS)
    fv, got = _run(head, [jnp.asarray(x_np)])  # eval → pam_cam only

    x = t(x_np.transpose(0, 3, 1, 2))
    # PAM branch
    pam = cm(x, fv, 'pam_in_conv', padding=1)
    b, c, h, w = pam.shape
    q = conv(pam, fv, 'pam/query_project_0').view(b, -1, h * w)
    q = q.permute(0, 2, 1)
    k = conv(pam, fv, 'pam/key_project_0').view(b, -1, h * w)
    v = conv(pam, fv, 'pam/value_project_0').view(b, -1, h * w)
    v = v.permute(0, 2, 1)
    sim = F.softmax(torch.matmul(q, k), dim=-1)
    ctx = torch.matmul(sim, v).permute(0, 2, 1).reshape(b, c, h, w)
    gamma_p = float(fv['params/pam/gamma'])
    pam = gamma_p * ctx + pam
    pam = cm(pam, fv, 'pam_out_conv', padding=1)
    # CAM branch
    cam = cm(x, fv, 'cam_in_conv', padding=1)
    pq = cam.view(b, c, -1)
    energy = torch.bmm(pq, pq.permute(0, 2, 1))
    energy_new = torch.max(energy, -1, keepdim=True)[0].expand_as(
        energy) - energy
    attn = F.softmax(energy_new, dim=-1)
    ctx = torch.bmm(attn, pq).view(b, c, h, w)
    gamma_c = float(fv['params/cam/gamma'])
    cam = gamma_c * ctx + cam
    cam = cm(cam, fv, 'cam_out_conv', padding=1)
    expected = conv(pam + cam, fv, 'conv_seg')
    _cmp(got, expected)


# ---------------------------------------------------------------------------
# ANNHead (reference ann_head.py: AFNB + APNB, PPM-sampled keys)
# ---------------------------------------------------------------------------
def _ppm_concat(feats, scales):
    """reference PPMConcat: adaptive-avg-pool each scale, flatten, concat
    along the token axis → (n, c, K)."""
    outs = [F.adaptive_avg_pool2d(feats, s).view(*feats.shape[:2], -1)
            for s in scales]
    return torch.cat(outs, dim=2)


def test_ann_head_oracle():
    rng = np.random.RandomState(6)
    low_np = rng.randn(2, 8, 8, 4).astype(np.float32)
    high_np = rng.randn(2, 4, 4, 8).astype(np.float32)
    scales = (1, 3)
    head = HEADS.get('ANNHead')(
        in_channels=[4, 8], channels=6, project_channels=4,
        query_scales=(1,), key_pool_scales=scales, num_classes=3,
        in_index=(0, 1), dropout_ratio=0.0, norm_cfg=BN, loss_decode=LOSS)
    fv, got = _run(head, [jnp.asarray(low_np), jnp.asarray(high_np)])

    low = t(low_np.transpose(0, 3, 1, 2))
    high = t(high_np.transpose(0, 3, 1, 2))

    def stage(prefix, query_feats, key_feats, shared):
        """reference SelfAttentionBlock: project FIRST (ConvModule for
        key/query, plain conv for value/out), THEN PPM-pool key/value."""
        q = cm(query_feats, fv, f'{prefix}/query_project_0')
        kname = 'query_project_0' if shared else 'key_project_0'
        k = cm(key_feats, fv, f'{prefix}/{kname}')
        v = conv(key_feats, fv, f'{prefix}/value_project_0')
        k = _ppm_concat(k, scales)                    # (n, ch, K)
        v = _ppm_concat(v, scales).permute(0, 2, 1)   # (n, K, ch)
        b, ch = q.shape[:2]
        qf = q.reshape(b, ch, -1).permute(0, 2, 1)
        sim = (ch ** -0.5) * torch.matmul(qf, k)
        sim = F.softmax(sim, dim=-1)
        ctx = torch.matmul(sim, v).permute(0, 2, 1).reshape(
            b, -1, *query_feats.shape[2:])
        return conv(ctx, fv, f'{prefix}/out_project_0')

    # AFNB: query=high, key=low; bottleneck 1x1 conv+BN, NO act
    prior = stage('fusion/stages_0', high, low, shared=False)
    out = cm(torch.cat([prior, high], 1), fv, 'fusion/bottleneck', act=False)
    out = cm(out, fv, 'bottleneck', padding=1)
    # APNB: shared key/query; activated bottleneck
    prior = stage('context/stages_0', out, out, shared=True)
    out = cm(torch.cat([prior, out], 1), fv, 'context/bottleneck')
    expected = conv(out, fv, 'conv_seg')
    _cmp(got, expected)
