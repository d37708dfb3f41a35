"""Mixed precision, remat, and sharded slide-inference tests."""
import jax
import jax.numpy as jnp
import numpy as np

from stc_unet_tpu.core import build_optimizer_tx
from stc_unet_tpu.engine import (TrainState, default_data_mesh,
                                 make_train_step)
from stc_unet_tpu.models import build_segmentor

CFG = dict(
    type='EncoderDecoder',
    backbone=dict(type='UnetBackbone', in_channels=3,
                  channel_list=[4, 8, 8, 8]),
    decode_head=dict(type='UnetHead', num_classes=2, channels=4,
                     decoder_channel=[16, 16, 16, 16, 4],
                     loss_decode=dict(type='CrossEntropyLoss')),
    test_cfg=dict(mode='slide', crop_size=(16, 16), stride=(8, 8)))


def _data(n=8, hw=16):
    img = np.random.RandomState(0).rand(n, hw, hw, 3).astype(np.float32)
    gt = (img.mean(-1) > 0.5).astype(np.int32)
    return img, gt


def test_bf16_train_step():
    model = build_segmentor(CFG)
    variables = model.init_weights(seed=0)
    tx = build_optimizer_tx(dict(type='Adam', lr=1e-3))
    step = make_train_step(model, tx, compute_dtype=jnp.bfloat16,
                           donate=False)
    state = TrainState.create(variables, tx)
    img, gt = _data()
    state2, logs = step(state, img, gt, jax.random.PRNGKey(0))
    assert np.isfinite(float(logs['loss']))
    # params remain fp32 (mixed precision, not casted weights)
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    assert leaf.dtype == jnp.float32


def test_remat_matches_plain():
    model = build_segmentor(CFG)
    variables = model.init_weights(seed=0)
    tx = build_optimizer_tx(dict(type='SGD', lr=1e-2))
    img, gt = _data()
    rng = jax.random.PRNGKey(0)
    s_plain, l_plain = make_train_step(model, tx, donate=False)(
        TrainState.create(variables, tx), img, gt, rng)
    s_remat, l_remat = make_train_step(model, tx, donate=False, remat=True)(
        TrainState.create(variables, tx), img, gt, rng)
    np.testing.assert_allclose(float(l_plain['loss']),
                               float(l_remat['loss']), rtol=1e-6)
    a = jax.tree_util.tree_leaves(s_plain.params)
    b = jax.tree_util.tree_leaves(s_remat.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5,
                                   atol=1e-7)


def test_sharded_slide_matches_single():
    """Tile-sharded slide inference equals unsharded (the SP analog)."""
    model = build_segmentor(CFG)
    model.init_weights(seed=0)
    img, _ = _data(n=2, hw=32)
    metas = [dict(ori_shape=(32, 32, 3), img_shape=(32, 32, 3),
                  pad_shape=(32, 32, 3), scale_factor=1.0, flip=False)
             for _ in range(2)]
    pred_single = model.simple_test(img, metas)

    model_sharded = build_segmentor(CFG)
    model_sharded.init_weights(seed=0)
    model_sharded.variables = model.variables
    model_sharded.set_mesh(default_data_mesh())
    pred_sharded = model_sharded.simple_test(img, metas)
    for a, b in zip(pred_single, pred_sharded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_spatial_sharded_whole_matches_unsharded():
    """2-D (data x spatial) mesh: whole-mode inference with images sharded
    along H (GSPMD halo exchange) must match the unsharded forward."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from stc_unet_tpu.models import build_segmentor
    cfg = dict(
        type='EncoderDecoder',
        backbone=dict(type='UnetBackbone', in_channels=3,
                      context_layer='kernelselect', transformer_block=True,
                      channel_list=[4, 8, 8, 8]),
        decode_head=dict(type='UnetHead', se=True, num_classes=2, channels=4,
                         decoder_channel=[16, 16, 16, 16, 4],
                         loss_decode=dict(type='CrossEntropyLoss')),
        test_cfg=dict(mode='whole'))
    model = build_segmentor(cfg)
    model.init_weights(seed=0, input_size=(32, 32))
    img = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    metas = [dict(ori_shape=(64, 64, 3), img_shape=(64, 64, 3),
                  pad_shape=(64, 64, 3), scale_factor=1.0, flip=False)
             for _ in range(2)]
    ref = model.simple_test(img, metas)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ('data', 'spatial'))
    model.set_mesh(mesh)
    got = model.simple_test(img, metas)
    np.testing.assert_array_equal(np.stack(got), np.stack(ref))
