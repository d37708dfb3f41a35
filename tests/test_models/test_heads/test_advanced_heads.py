"""DPTHead / KNet / ConvNeXt tests."""
import jax
import numpy as np
import pytest

from stc_unet_tpu.models import build_backbone, build_head


def test_convnext_backbone():
    bb = build_backbone(dict(type='ConvNeXt', arch='tiny',
                             drop_path_rate=0.1))
    x = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    v = bb.init({'params': jax.random.PRNGKey(0),
                 'dropout': jax.random.PRNGKey(1)}, x)
    outs = bb.apply(v, x)
    assert [o.shape[-1] for o in outs] == [96, 192, 384, 768]
    assert outs[0].shape[1] == 8


def test_timm_backbone_raises():
    bb = build_backbone(dict(type='TIMMBackbone', model_name='resnet18'))
    with pytest.raises(NotImplementedError):
        bb(np.zeros((1, 8, 8, 3), np.float32))


def test_dpt_head():
    head = build_head(dict(type='DPTHead', in_channels=[16] * 4, channels=8,
                           embed_dims=16, post_process_channels=[4, 8, 16,
                                                                 32],
                           num_classes=3, input_transform='multiple_select',
                           in_index=[0, 1, 2, 3], norm_cfg=dict(type='BN')))
    feats = [np.random.RandomState(i).rand(1, 4, 4, 16).astype(np.float32)
             for i in range(4)]
    v = head.init({'params': jax.random.PRNGKey(0),
                   'dropout': jax.random.PRNGKey(1)}, feats)
    out = head.apply(v, feats)
    assert out.shape[-1] == 3


def test_knet_iterative_head():
    gen = dict(type='FCNHead', in_channels=16, in_index=0, channels=16,
               num_convs=1, concat_input=False, num_classes=5)
    knet = build_head(dict(
        type='IterativeDecodeHead', num_stages=2, num_classes=5,
        in_channels=16, channels=16, kernel_generate_head=gen,
        kernel_update_head=dict(num_classes=5, num_heads=2, in_channels=16,
                                feedforward_channels=32)))
    feats = [np.random.RandomState(0).rand(1, 8, 8, 16).astype(np.float32)]
    v = knet.init({'params': jax.random.PRNGKey(0),
                   'dropout': jax.random.PRNGKey(1)}, feats)
    out = knet.apply(v, feats)
    assert out.shape == (1, 8, 8, 5)
    outs = knet.apply(v, feats, train=True,
                      rngs={'dropout': jax.random.PRNGKey(2)},
                      mutable=['batch_stats'])[0]
    assert len(outs) == 3
    losses = knet.loss_by_feat(
        outs, np.random.RandomState(1).randint(0, 5, (1, 8, 8)))
    # reference knet_head.py:456 stage-suffix convention
    assert 'loss_ce.s0' in losses and 'loss_ce.s2' in losses
    for k, val in losses.items():
        assert np.isfinite(float(val)), k
