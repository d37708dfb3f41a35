"""Monolithic (EncoderDecoderFull) model family tests:
UNet++ / DC-UNet / TransUNet / SwinUNet (≙ reference test_heads suites)."""
import jax
import numpy as np
import pytest

from stc_unet_tpu.models import build_segmentor

LOSSES = [dict(type='CrossEntropyLoss', use_sigmoid=False,
               loss_name='loss_bce', loss_weight=1.0),
          dict(type='DiceLoss', loss_name='loss_dice', loss_weight=1.0)]


def _metas(h, w, n=1):
    return [dict(ori_shape=(h, w, 3), img_shape=(h, w, 3),
                 pad_shape=(h, w, 3), scale_factor=1.0, flip=False)
            for _ in range(n)]


def _full(head_cfg, h=32, w=32):
    model = build_segmentor(dict(type='EncoderDecoderFull',
                                 decode_head=head_cfg,
                                 test_cfg=dict(mode='whole')))
    model.init_weights(seed=0, input_size=(h, w))
    img = np.random.RandomState(0).rand(1, h, w, 3).astype(np.float32)
    gt = np.random.RandomState(1).randint(0, 2, (1, h, w))
    losses = model.forward_train(img, _metas(h, w), gt)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    preds = model.simple_test(img, _metas(h, w))
    assert preds[0].shape == (h, w)
    return model


def test_dc_unet():
    _full(dict(type='DC_Unet', out_channels=2, nf=4,
               norm_cfg=dict(type='BN'), loss_decode=LOSSES))


def test_dc_unet_with_cp_equivalence():
    """Per-block remat (``with_cp``) must not change the loss (reference
    torch ``checkpoint`` semantics: identical math, recomputed backward)."""
    import jax.numpy as jnp

    from stc_unet_tpu.core import build_optimizer_tx
    from stc_unet_tpu.engine import TrainState, make_train_step

    head = dict(type='DC_Unet', out_channels=2, nf=4,
                norm_cfg=dict(type='BN'), loss_decode=LOSSES)
    h = w = 32
    img = np.random.RandomState(0).rand(1, h, w, 3).astype(np.float32)
    gt = np.random.RandomState(1).randint(0, 2, (1, h, w))
    tx = build_optimizer_tx(dict(type='Adam', lr=1e-4, betas=(0.9, 0.999)))
    losses = {}
    variables = None
    for with_cp in (False, True, 'hires'):
        model = build_segmentor(dict(
            type='EncoderDecoderFull',
            decode_head=dict(head, with_cp=with_cp),
            test_cfg=dict(mode='whole')))
        if variables is None:
            variables = model.init_weights(seed=0, input_size=(h, w))
        model.variables = variables
        step = make_train_step(model, tx)
        state = TrainState.create(
            jax.tree_util.tree_map(jnp.array, variables), tx)
        _, lv = step(state, img, gt, jax.random.PRNGKey(0))
        losses[with_cp] = float(lv['loss'])
    assert max(losses.values()) - min(losses.values()) < 1e-5, losses


def test_transunet():
    _full(dict(type='TransUNet', img_dim=32, in_channels=3, out_channels=16,
               head_num=4, mlp_dim=32, block_num=2, patch_dim=16,
               class_num=2, loss_decode=LOSSES))


def test_swinunet():
    # pr = 64/8 = 8 → three patch-mergings (8→4→2→1), like 512/8=64 at scale
    _full(dict(type='SwinUNet', img_size=64, patch_size=8, window_size=4,
               out_channel=8, num_classes=2, loss_decode=LOSSES), h=64, w=64)


def test_unetpp():
    _full(dict(type='UnetPlusPlus', num_classes=2,
               norm_cfg=dict(type='BN'), loss_decode=LOSSES))


def test_swinunet_shifted_windows_change_output():
    """Shifted-window masking must actually differ from unshifted."""
    from stc_unet_tpu.models.utils.swin_core import (SwinTransformerBlock,
                                                     shifted_window_mask)
    mask = shifted_window_mask(8, 8, 4, 2)
    assert mask is not None and (mask < 0).any()
    x = np.random.RandomState(0).rand(1, 64, 16).astype(np.float32)
    blk0 = SwinTransformerBlock(16, (8, 8), 4, window_size=4, shift_size=0)
    blk2 = SwinTransformerBlock(16, (8, 8), 4, window_size=4, shift_size=2)
    v0 = blk0.init(jax.random.PRNGKey(0), x)
    y0 = blk0.apply(v0, x)
    y2 = blk2.apply(v0, x)
    assert not np.allclose(np.asarray(y0), np.asarray(y2))
