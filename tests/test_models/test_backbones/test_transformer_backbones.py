"""Twins (PCPVT/SVT) and BEiT/MAE backbone tests."""
import jax
import numpy as np

from stc_unet_tpu.models import build_backbone


def _forward(cfg, shape=(1, 32, 32, 3)):
    bb = build_backbone(cfg)
    x = np.random.RandomState(0).rand(*shape).astype(np.float32)
    variables = bb.init({'params': jax.random.PRNGKey(0),
                         'dropout': jax.random.PRNGKey(1)}, x)
    return bb.apply(variables, x)


def test_pcpvt():
    outs = _forward(dict(type='PCPVT', embed_dims=(4, 8, 16, 32),
                         depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8)))
    assert [o.shape[-1] for o in outs] == [4, 8, 16, 32]
    assert outs[0].shape[1] == 8


def test_svt():
    outs = _forward(dict(type='SVT', embed_dims=(4, 8, 16, 32),
                         depths=(2, 2, 2, 2), num_heads=(1, 2, 4, 8),
                         windiow_sizes=(2, 2, 2, 2)))
    assert [o.shape[-1] for o in outs] == [4, 8, 16, 32]


def test_beit():
    outs = _forward(dict(type='BEiT', img_size=32, patch_size=8,
                         embed_dims=16, num_layers=2, num_heads=2,
                         out_indices=(0, 1)))
    assert [o.shape for o in outs] == [(1, 4, 4, 16), (1, 4, 4, 16)]


def test_mae():
    outs = _forward(dict(type='MAE', img_size=32, patch_size=8,
                         embed_dims=16, num_layers=2, num_heads=2,
                         out_indices=(1,)))
    assert outs[0].shape == (1, 4, 4, 16)
