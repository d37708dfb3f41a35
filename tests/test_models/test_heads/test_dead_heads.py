"""Forward/shape tests for the reference's dead-on-disk heads, now carried
for full inventory parity (reference files ``acc_head.py``, ``ege_head.py``,
``eiunet_head.py``, ``meta_head.py``, ``pdatt_head.py``, ``levit_head.py``
— all decorated there but never imported by its ``__init__``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stc_unet_tpu.models.builder import HEADS, build_head


def _forward(cfg, shape=(1, 32, 32, 3)):
    head = build_head(cfg)
    x = jnp.zeros(shape)
    variables = head.init(jax.random.PRNGKey(0), x, train=True)
    out = head.apply(variables, x, train=False)
    flat = out[1] if isinstance(out, tuple) and isinstance(out[0], tuple) \
        else out
    assert np.isfinite(np.asarray(flat)).all()
    return out


def test_dead_heads_registered():
    for name in ['ACCUNet', 'EGEUNet', 'EIU_Net', 'META_Unet', 'PYAttUNet',
                 'LeViT_UNet_192']:
        assert name in HEADS, name


def test_ege_unet_gt_ds_outputs():
    gts, out = _forward(dict(type='EGEUNet', num_classes=2, channels=8,
                             c_list=[8, 8, 8, 8, 8, 8],
                             loss_decode=dict(type='CrossEntropyLoss')),
                        (1, 64, 64, 3))
    assert out.shape == (1, 64, 64, 2)
    assert len(gts) == 5
    assert all(g.shape == (1, 64, 64, 1) for g in gts)
    assert float(out.min()) >= 0 and float(out.max()) <= 1  # sigmoid


def test_acc_unet_binary_and_multiclass():
    out = _forward(dict(type='ACCUNet', n_classes=1, n_filts=8,
                        num_classes=2, channels=8, threshold=0.5,
                        loss_decode=dict(type='CrossEntropyLoss')))
    assert out.shape == (1, 32, 32, 1)
    out = _forward(dict(type='ACCUNet', n_classes=3, n_filts=8,
                        num_classes=3, channels=8,
                        loss_decode=dict(type='CrossEntropyLoss')))
    # reference quirk: multi-class output has n_classes + 1 channels
    assert out.shape == (1, 32, 32, 4)


def test_eiu_net():
    out = _forward(dict(type='EIU_Net', n_classes=2, num_classes=2,
                        channels=8, filters=(8, 8, 8, 8, 8),
                        loss_decode=dict(type='CrossEntropyLoss')))
    assert out.shape == (1, 32, 32, 2)


def test_meta_unet():
    out = _forward(dict(type='META_Unet', classes=3, num_classes=3,
                        channels=8,
                        loss_decode=dict(type='CrossEntropyLoss')),
                   (1, 64, 64, 3))
    assert out.shape == (1, 64, 64, 3)


def test_pyatt_unet():
    out = _forward(dict(type='PYAttUNet', num_classes=2, channels=8,
                        nb_filter=(4, 8, 8, 8, 8),
                        loss_decode=dict(type='CrossEntropyLoss')))
    assert out.shape == (1, 32, 32, 2)


def test_levit_unet():
    out = _forward(dict(type='LeViT_UNet_192', num_classes=4, channels=8,
                        embed_dim=(32, 48, 64), key_dim=8, heads=(2, 2, 2),
                        depth=(1, 1, 1),
                        loss_decode=dict(type='CrossEntropyLoss')),
                   (1, 64, 64, 3))
    assert out.shape == (1, 64, 64, 4)
