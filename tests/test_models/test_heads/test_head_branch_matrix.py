"""Cfg-branch matrix over the stock zoo heads: each case flips a real
config branch of one head (≙ the reference's per-head test files under
``tests/test_models/test_heads/`` — e.g. test_psa_head.py exercising
psa_type variants, test_dpt_head.py the readout types, ...). All cases
assert the (N, H, W, num_classes) shape contract at the head's native
scale and finite outputs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stc_unet_tpu.models.builder import build_head

H = W = 16
FEATS4 = [np.random.RandomState(i).rand(1, H // 2 ** i, W // 2 ** i,
                                        8 * 2 ** i).astype(np.float32)
          for i in range(4)]
NC = dict(num_classes=3, norm_cfg=dict(type='BN'))


def _run(cfg, feats=None, out_hw=None):
    feats = [jnp.asarray(f) for f in (feats or FEATS4)]
    head = build_head(cfg)
    variables = head.init(jax.random.PRNGKey(0), feats, train=True)
    out = head.apply(variables, feats, train=False)
    if isinstance(out, tuple):  # EncHead (seg, se) at test time honors both
        out = out[0]
    if out_hw is not None:
        assert out.shape[1:3] == out_hw, out.shape
    assert out.shape[-1] == 3
    assert np.isfinite(np.asarray(out)).all()
    return out


CASES = [
    ('fcn_identity_convs', dict(type='FCNHead', in_channels=8, channels=8,
                                num_convs=0, concat_input=False, in_index=0,
                                **NC)),
    ('psp_scales_124', dict(type='PSPHead', in_channels=64, channels=8,
                            pool_scales=(1, 2, 4), in_index=3, **NC)),
    ('aspp_dilations', dict(type='ASPPHead', in_channels=64, channels=8,
                            dilations=(1, 6, 12), in_index=3, **NC)),
    ('sep_aspp_no_c1', dict(type='DepthwiseSeparableASPPHead',
                            in_channels=64, channels=8, c1_in_channels=0,
                            c1_channels=0, dilations=(1, 6), in_index=3,
                            **NC)),
    ('uper_scales', dict(type='UPerHead', in_channels=[8, 16, 32, 64],
                         channels=8, pool_scales=(1, 2),
                         in_index=[0, 1, 2, 3],
                         input_transform='multiple_select', **NC)),
    ('ann_scales', dict(type='ANNHead', in_channels=[32, 64], channels=8,
                        project_channels=8, query_scales=(1, 2),
                        key_pool_scales=(1, 3), in_index=(2, 3), **NC)),
    ('da_head', dict(type='DAHead', in_channels=64, channels=16,
                     pam_channels=16, in_index=3, **NC)),
    ('ema_stages', dict(type='EMAHead', in_channels=64, channels=8,
                        ema_channels=8, num_bases=4, num_stages=2,
                        concat_input=False, in_index=3, **NC)),
    ('dnl_gaussian', dict(type='DNLHead', in_channels=64, channels=8,
                          mode='gaussian', in_index=3, **NC)),
    ('dnl_dot_product', dict(type='DNLHead', in_channels=64, channels=8,
                             mode='dot_product', use_scale=False,
                             in_index=3, **NC)),
    ('isa_down_factor', dict(type='ISAHead', in_channels=64, channels=8,
                             isa_channels=8, down_factor=(4, 4), in_index=3,
                             **NC)),
    ('apc_no_fusion', dict(type='APCHead', in_channels=64, channels=8,
                           pool_scales=(1, 3), fusion=False, in_index=3,
                           **NC)),
    ('dm_no_fusion', dict(type='DMHead', in_channels=64, channels=8,
                          filter_sizes=(1, 3), fusion=False, in_index=3,
                          **NC)),
    ('gc_ratio', dict(type='GCHead', in_channels=64, channels=8, ratio=0.5,
                      pooling_type='avg', fusion_types=('channel_mul',),
                      in_index=3, **NC)),
    ('nl_dot_product', dict(type='NLHead', in_channels=64, channels=8,
                            mode='dot_product', use_scale=False, in_index=3,
                            **NC)),
    ('setr_up', dict(type='SETRUPHead', in_channels=64, channels=8,
                     num_convs=2, up_scale=2, kernel_size=3, in_index=3,
                     norm_cfg=dict(type='LN'), num_classes=3)),
    ('segmenter_layers', dict(type='SegmenterMaskTransformerHead',
                              in_channels=64, channels=8, num_layers=1,
                              num_heads=2, embed_dims=8, in_index=3,
                              num_classes=3)),
    ('stdc_head', dict(type='STDCHead', in_channels=8, channels=8,
                       num_convs=1, concat_input=False, in_index=0,
                       boundary_threshold=0.1, num_classes=2,
                       norm_cfg=dict(type='BN'),
                       loss_decode=[dict(type='CrossEntropyLoss',
                                         loss_name='loss_ce'),
                                    dict(type='DiceLoss',
                                         loss_name='loss_dice')])),
    ('lraspp', dict(type='LRASPPHead', in_channels=(8, 16, 64),
                    channels=8, branch_channels=(4, 4), in_index=(0, 1, 3),
                    input_transform='multiple_select',
                    act_cfg=dict(type='ReLU'), **NC)),
]


@pytest.mark.parametrize('name,cfg', CASES, ids=[c[0] for c in CASES])
def test_head_cfg_branch(name, cfg):
    if cfg.get('num_classes') == 2:
        cfg = dict(cfg, num_classes=3)
    _run(cfg)


def test_psa_types():
    """psa_type branches (reference test_psa_head.py); tiny mask size."""
    for psa_type in ('collect', 'distribute', 'bi-direction'):
        cfg = dict(type='PSAHead', in_channels=64, channels=8,
                   mask_size=(4, 4), psa_type=psa_type, shrink_factor=1,
                   in_index=3, **NC)
        _run(cfg)


def test_psa_compact_and_no_softmax():
    # compact mode requires mask_h*mask_w == h*w after shrink (the
    # reference's view(n, h*w, h*w) enforces the same) — in_index=3 is 2x2
    cfg = dict(type='PSAHead', in_channels=64, channels=8, mask_size=(2, 2),
               psa_type='collect', compact=True, psa_softmax=False,
               shrink_factor=1, in_index=3, **NC)
    _run(cfg)


def test_dpt_readout_types():
    """DPT readout branches (reference test_dpt_head.py). DPT consumes
    (feature, cls_token) tuples at ViT scale."""
    feats = [(jnp.ones((1, 4, 4, 8)), jnp.ones((1, 8))) for _ in range(4)]
    for readout in ('ignore', 'add', 'project'):
        head = build_head(dict(type='DPTHead', in_channels=(8, 8, 8, 8),
                               channels=8, embed_dims=8,
                               post_process_channels=[4, 8, 16, 32],
                               readout_type=readout, num_classes=3,
                               input_transform='multiple_select',
                               norm_cfg=dict(type='BN')))
        variables = head.init(jax.random.PRNGKey(0), feats, train=True)
        out = head.apply(variables, feats, train=False)
        assert out.shape[-1] == 3
        assert np.isfinite(np.asarray(out)).all()


def test_enc_head_branches():
    for kw in (dict(use_se_loss=False), dict(add_lateral=True)):
        head = build_head(dict(type='EncHead', in_channels=[8, 16, 32, 64],
                               channels=8, num_codes=4, in_index=(0, 1, 2, 3),
                               input_transform='multiple_select', **NC, **kw))
        feats = [jnp.asarray(f) for f in FEATS4]
        variables = head.init(jax.random.PRNGKey(0), feats, train=True)
        out = head.apply(variables, feats, train=False)
        out = out[0] if isinstance(out, tuple) else out
        assert out.shape[-1] == 3


def test_dpt_expand_channels_scales_widths():
    """reference dpt_head.py:253-255: expand_channels multiplies level i's
    post-process width by 2**i (param shapes must reflect it)."""
    feats = [jnp.ones((1, 4, 4, 8)) for _ in range(4)]
    head = build_head(dict(type='DPTHead', in_channels=(8, 8, 8, 8),
                           channels=8, embed_dims=8,
                           post_process_channels=[4, 4, 4, 4],
                           expand_channels=True, num_classes=3,
                           input_transform='multiple_select',
                           norm_cfg=dict(type='BN')))
    variables = head.init(jax.random.PRNGKey(0), feats, train=True)
    flat = jax.tree_util.tree_leaves_with_path(variables['params'])
    widths = {str(p): l.shape for p, l in flat if 'projects' in str(p)
              and 'kernel' in str(p) and 'readout' not in str(p)}
    got = sorted(v[-1] for v in widths.values())
    assert got == [4, 8, 16, 32], widths
