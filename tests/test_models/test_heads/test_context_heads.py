"""Attention/context head family tests (NL/GC/DA/DNL/ANN/EMA/DM/APC/ISA/
Enc/LRASPP/STDC/SETR/Segmenter) — shape + finite-loss checks, mirroring the
reference's per-head test files."""
import jax
import numpy as np
import pytest

from stc_unet_tpu.models import build_head


def _run_head(cfg, in_shapes, train=False):
    head = build_head(cfg)
    rng = np.random.RandomState(0)
    inputs = [rng.rand(*s).astype(np.float32) for s in in_shapes]
    variables = head.init({'params': jax.random.PRNGKey(0),
                           'dropout': jax.random.PRNGKey(1)}, inputs,
                          train=False)
    out = head.apply(variables, inputs, train=train,
                     rngs={'dropout': jax.random.PRNGKey(2)} if train
                     else None,
                     mutable=['batch_stats'] if train else False)
    if train:
        out = out[0]
    return head, out


BASE = dict(channels=8, num_classes=3, norm_cfg=dict(type='BN'),
            in_index=0)
SHAPE = [(1, 8, 8, 16)]


@pytest.mark.parametrize('head_type', ['NLHead', 'GCHead', 'DNLHead'])
def test_nonlocal_family(head_type):
    _, out = _run_head(dict(type=head_type, in_channels=16, **BASE), SHAPE)
    assert out.shape == (1, 8, 8, 3)


def test_da_head_train_and_eval():
    head, out = _run_head(dict(type='DAHead', in_channels=16,
                               pam_channels=8, **BASE), SHAPE)
    assert out.shape == (1, 8, 8, 3)
    head2, outs = _run_head(dict(type='DAHead', in_channels=16,
                                 pam_channels=8, **BASE), SHAPE, train=True)
    assert isinstance(outs, tuple) and len(outs) == 3
    labels = np.random.RandomState(1).randint(0, 3, (1, 8, 8))
    losses = head2.loss_by_feat(outs, labels)
    assert 'loss_ce' in losses and 'pam.loss_ce' in losses


def test_ann_head():
    _, out = _run_head(dict(type='ANNHead', in_channels=[8, 16],
                            in_index=[0, 1],
                            input_transform='multiple_select',
                            project_channels=8, channels=8, num_classes=3,
                            norm_cfg=dict(type='BN'),
                            key_pool_scales=(1, 3)),
                       [(1, 8, 8, 8), (1, 4, 4, 16)])
    assert out.shape == (1, 4, 4, 3)


@pytest.mark.parametrize('cfg_extra', [
    dict(type='EMAHead', ema_channels=8, num_bases=4, num_stages=2),
    dict(type='DMHead', filter_sizes=(1, 3), fusion=True),
    dict(type='APCHead', pool_scales=(1, 2), fusion=True),
    dict(type='ISAHead', isa_channels=8, down_factor=(2, 2)),
])
def test_misc_context_heads(cfg_extra):
    _, out = _run_head(dict(in_channels=16, **BASE, **cfg_extra), SHAPE)
    assert out.shape == (1, 8, 8, 3)


def test_enc_head_with_se_loss():
    head, out = _run_head(dict(type='EncHead', in_channels=[16],
                               in_index=[0],
                               input_transform='multiple_select',
                               channels=8, num_classes=3, num_codes=4,
                               use_se_loss=True,
                               norm_cfg=dict(type='BN')), SHAPE)
    seg, se = out
    assert seg.shape == (1, 8, 8, 3) and se.shape == (1, 3)
    labels = np.random.RandomState(1).randint(0, 3, (1, 8, 8))
    losses = head.loss_by_feat(out, labels)
    assert 'loss_se' in losses and np.isfinite(float(losses['loss_se']))


def test_lraspp_head():
    _, out = _run_head(dict(type='LRASPPHead', in_channels=[4, 8, 16],
                            in_index=[0, 1, 2],
                            input_transform='multiple_select',
                            channels=8, num_classes=3,
                            branch_channels=(2, 4),
                            norm_cfg=dict(type='BN')),
                       [(1, 16, 16, 4), (1, 8, 8, 8), (1, 4, 4, 16)])
    assert out.shape == (1, 16, 16, 3)


def test_stdc_head_boundary_loss():
    head, out = _run_head(dict(type='STDCHead', in_channels=16,
                               num_convs=1, concat_input=False,
                               boundary_threshold=0.1, **BASE), SHAPE)
    labels = np.random.RandomState(1).randint(0, 3, (1, 8, 8))
    losses = head.loss_by_feat(out, labels)
    assert np.isfinite(float(losses['loss_ce']))


def test_setr_up_head():
    _, out = _run_head(dict(type='SETRUPHead', in_channels=16, channels=8,
                            num_classes=3, num_convs=1, up_scale=2,
                            norm_cfg=dict(type='BN'), in_index=0), SHAPE)
    assert out.shape == (1, 16, 16, 3)


def test_setr_mla_head():
    _, out = _run_head(dict(type='SETRMLAHead', in_channels=[8, 8],
                            in_index=[0, 1],
                            input_transform='multiple_select',
                            channels=8, mla_channels=4, up_scale=2,
                            num_classes=3),
                       [(1, 4, 4, 8), (1, 4, 4, 8)])
    assert out.shape == (1, 8, 8, 3)


def test_segmenter_mask_head():
    _, out = _run_head(dict(type='SegmenterMaskTransformerHead',
                            in_channels=16, channels=8, num_classes=3,
                            num_layers=1, num_heads=2, embed_dims=16,
                            in_index=0), SHAPE)
    assert out.shape == (1, 8, 8, 3)


def test_ema_head_bases_buffer_updates_in_train():
    """Reference ema_head registers bases as a BUFFER with train-time EMA
    (ema_head.py:39-43,68-73): bases must live in batch_stats (synced by
    the train step like BN) and move during training, stay fixed at eval."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from stc_unet_tpu.models.builder import build_head
    head = build_head(dict(type='EMAHead', in_channels=16, channels=8,
                           ema_channels=8, num_bases=4, num_stages=2,
                           momentum=0.5, concat_input=False, in_index=0,
                           num_classes=2, norm_cfg=dict(type='BN')))
    feats = [jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 16),
                         jnp.float32)]
    variables = head.init(jax.random.PRNGKey(0), feats, train=True)
    assert 'bases' in str(jax.tree_util.tree_structure(
        variables['batch_stats']))
    before = None
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            variables['batch_stats']):
        if 'bases' in str(path):
            before = np.asarray(leaf)
    _, new_state = head.apply(variables, feats, train=True,
                              mutable=['batch_stats'],
                              rngs={'dropout': jax.random.PRNGKey(1)})
    after = None
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            new_state['batch_stats']):
        if 'bases' in str(path):
            after = np.asarray(leaf)
    assert before is not None and after is not None
    assert not np.allclose(before, after)  # EMA moved
    # eval: buffer untouched
    _ = head.apply(variables, feats, train=False)
