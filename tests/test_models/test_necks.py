"""Dedicated neck branch tests: FPN extra-conv modes, JPU level windows,
MLANeck, MultiLevelNeck scales, Feature2Pyramid rescales (≙ the
reference's tests/test_models/test_necks/* files)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stc_unet_tpu.models import build_neck

FEATS = [jnp.asarray(np.random.RandomState(i).rand(
    1, 16 // 2 ** i, 16 // 2 ** i, 8 * 2 ** i).astype(np.float32))
    for i in range(4)]


def _run(cfg, feats=FEATS):
    neck = build_neck(cfg)
    variables = neck.init(jax.random.PRNGKey(0), feats, train=True)
    outs = neck.apply(variables, feats, train=False)
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()
    return outs


def test_fpn_basic_and_num_outs():
    outs = _run(dict(type='FPN', in_channels=[8, 16, 32, 64],
                     out_channels=8, num_outs=4))
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
    assert all(o.shape[-1] == 8 for o in outs)


def test_fpn_extra_convs_on_output():
    outs = _run(dict(type='FPN', in_channels=[8, 16, 32, 64],
                     out_channels=8, num_outs=5,
                     add_extra_convs='on_output'))
    assert len(outs) == 5
    assert outs[-1].shape[1] == 1  # extra stride-2 conv below the coarsest


def test_fpn_extra_pool():
    outs = _run(dict(type='FPN', in_channels=[8, 16, 32, 64],
                     out_channels=8, num_outs=5, add_extra_convs=False))
    assert len(outs) == 5


def test_fpn_start_level():
    outs = _run(dict(type='FPN', in_channels=[8, 16, 32, 64],
                     out_channels=8, num_outs=3, start_level=1))
    assert [o.shape[1] for o in outs] == [8, 4, 2]


def test_jpu_dilations_and_levels():
    outs = _run(dict(type='JPU', in_channels=(8, 16, 32, 64),
                     mid_channels=8, start_level=1, end_level=-1,
                     dilations=(1, 2), norm_cfg=dict(type='BN')))
    # JPU returns (unchanged lowers..., fused) per the reference contract
    assert outs[-1].shape[-1] == 8 * 2  # len(dilations) * mid
    assert outs[-1].shape[1] == FEATS[1].shape[1]


def test_multilevel_neck_scales():
    feats = [jnp.ones((1, 4, 4, 8))] * 4
    outs = _run(dict(type='MultiLevelNeck', in_channels=[8] * 4,
                     out_channels=8, scales=[0.5, 1, 2, 4]), feats)
    assert [o.shape[1] for o in outs] == [2, 4, 8, 16]


def test_feature2pyramid_rescales():
    feats = [jnp.ones((1, 4, 4, 8))] * 4
    outs = _run(dict(type='Feature2Pyramid', embed_dim=8,
                     rescales=[4, 2, 1, 0.5], norm_cfg=dict(type='BN')),
                feats)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]


def test_mla_neck():
    feats = [jnp.ones((1, 4, 4, 16))] * 4
    outs = _run(dict(type='MLANeck', in_channels=[16] * 4, out_channels=8,
                     norm_cfg=dict(type='BN')), feats)
    assert len(outs) == 4
    assert all(o.shape == (1, 4, 4, 8) for o in outs)
