"""End-to-end learning test: the full train step (losses, grads, optimizer,
BN updates) must actually learn a separable task — the strongest single
correctness signal for the training stack."""
import jax
import numpy as np

from stc_unet_tpu.core import (build_lr_schedule, build_optimizer_tx,
                               eval_metrics)
from stc_unet_tpu.engine import TrainState, make_train_step
from stc_unet_tpu.models import build_segmentor


def test_unet_converges_on_separable_task():
    model = build_segmentor(dict(
        type='EncoderDecoder',
        backbone=dict(type='UnetBackbone', in_channels=3,
                      channel_list=[8, 16, 32, 32]),
        decode_head=dict(
            type='UnetHead', num_classes=2, channels=8,
            decoder_channel=[64, 32, 16, 16, 8],
            loss_decode=[
                dict(type='CrossEntropyLoss', loss_name='loss_bce'),
                dict(type='DiceLoss', loss_name='loss_dice')]),
        test_cfg=dict(mode='whole')))
    variables = model.init_weights(seed=0)
    rng = np.random.RandomState(0)
    imgs = rng.rand(32, 32, 32, 3).astype(np.float32)
    gts = (imgs[..., 0] > imgs[..., 1]).astype(np.int32)  # separable

    sched = build_lr_schedule(dict(policy='poly', power=0.9, min_lr=1e-5,
                                   by_epoch=False), 3e-3, 300)
    tx = build_optimizer_tx(dict(type='Adam', lr=3e-3), schedule=sched)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx)
    key = jax.random.PRNGKey(0)
    first_loss = None
    for it in range(300):
        idx = rng.choice(32, 8, replace=False)
        state, logs = step(state, imgs[idx], gts[idx], key)
        if first_loss is None:
            first_loss = float(logs['loss'])
    final_loss = float(logs['loss'])
    assert final_loss < first_loss * 0.2

    model.variables = state.variables
    metas = [dict(ori_shape=(32, 32, 3), img_shape=(32, 32, 3),
                  pad_shape=(32, 32, 3), scale_factor=1.0, flip=False)
             for _ in range(8)]
    preds = model.simple_test(imgs[:8], metas)
    m = eval_metrics(preds, list(gts[:8]), 2, 255, metrics=['mIoU'])
    assert np.nanmean(m['IoU']) > 0.9
