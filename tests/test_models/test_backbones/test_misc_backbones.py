"""Dedicated tests for the remaining registered backbones: PoolFormer,
ClsResNet18, Self_Define_Backbone, IdentityBackbone, MobileNetV3-large,
ResNeXt/ResNeSt cfg branches (≙ reference per-backbone test files)."""
import jax
import numpy as np
import pytest

from stc_unet_tpu.models import build_backbone


def _run(cfg, shape=(1, 32, 32, 3)):
    bb = build_backbone(cfg)
    x = np.random.RandomState(0).rand(*shape).astype(np.float32)
    variables = bb.init({'params': jax.random.PRNGKey(0),
                         'dropout': jax.random.PRNGKey(1)}, x)
    return bb.apply(variables, x)


def test_poolformer():
    outs = _run(dict(type='PoolFormer', arch='s12', out_indices=(0, 2, 4, 6),
                     init_cfg=None), (1, 64, 64, 3))
    assert len(outs) == 4
    # strides 4/8/16/32
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]


def test_poolformer_mmcls_alias():
    """zoo configs use type='mmcls.PoolFormer' — the alias must resolve."""
    outs = _run(dict(type='mmcls.PoolFormer', arch='s12',
                     out_indices=(0, 2, 4, 6), init_cfg=None), (1, 32, 32, 3))
    assert len(outs) == 4


def test_identity_backbone():
    outs = _run(dict(type='IdentityBackbone'), (2, 16, 16, 3))
    out = outs[0] if isinstance(outs, (list, tuple)) else outs
    assert out.shape == (2, 16, 16, 3)


def test_self_define_backbone():
    """The fork's Self_Define_Backbone stub: passthrough feature provider."""
    outs = _run(dict(type='Self_Define_Backbone'), (1, 16, 16, 3))
    out = outs[0] if isinstance(outs, (list, tuple)) else outs
    assert out.shape[0] == 1


def test_cls_resnet18():
    outs = _run(dict(type='ClsResNet18'), (1, 64, 64, 3))
    outs = outs if isinstance(outs, (list, tuple)) else [outs]
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_mobilenet_v3_large():
    outs = _run(dict(type='MobileNetV3', arch='large',
                     out_indices=(1, 3, 16)), (1, 64, 64, 3))
    assert len(outs) == 3
    assert outs[-1].shape[-1] == 960


def test_resnext_grouped_vs_resnet_differs():
    x = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    outs = {}
    for t, kw in [('ResNeXt', dict(groups=2, base_width=4)),
                  ('ResNet', dict())]:
        bb = build_backbone(dict(type=t, depth=50, num_stages=4,
                                 out_indices=(3,), stem_channels=8,
                                 base_channels=8, **kw))
        variables = bb.init({'params': jax.random.PRNGKey(0)}, x)
        outs[t] = np.asarray(bb.apply(variables, x)[0])
    assert outs['ResNeXt'].shape == outs['ResNet'].shape


def test_resnest_stem_and_split_attention():
    outs = _run(dict(type='ResNeSt', depth=50, stem_channels=16,
                     base_channels=8, radix=2, reduction_factor=4,
                     out_indices=(0, 1, 2, 3)), (1, 32, 32, 3))
    assert len(outs) == 4
