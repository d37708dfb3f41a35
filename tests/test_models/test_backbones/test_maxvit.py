"""MaxViT encoder + decoder tests (≙ reference maxvit suites)."""
import numpy as np

from stc_unet_tpu.models import build_segmentor

LOSSES = [dict(type='CrossEntropyLoss', use_sigmoid=False,
               loss_name='loss_bce', loss_weight=1.0),
          dict(type='DiceLoss', loss_name='loss_dice', loss_weight=1.0)]


def test_maxvit_unet_tiny():
    h = w = 64
    model = build_segmentor(dict(
        type='EncoderDecoder',
        backbone=dict(type='MaxViT', in_channels=3, depths=(1, 1, 1, 1),
                      channels=(8, 8, 8, 8), embed_dim=8, num_heads=2,
                      grid_window_size=(2, 2), attn_drop=0.1, drop=0.1,
                      drop_path=0.1, mlp_ratio=2),
        decode_head=dict(type='MaxViTDecoder', in_channels=[8, 8, 8, 8],
                         output_size=(32, 32), num_heads=2,
                         grid_window_size=(2, 2), depths=(1, 1, 1),
                         channels=8, num_classes=2, mlp_ratio=2.0,
                         loss_decode=LOSSES),
        test_cfg=dict(mode='whole')))
    model.init_weights(seed=0, input_size=(h, w))
    img = np.random.RandomState(0).rand(1, h, w, 3).astype(np.float32)
    metas = [dict(ori_shape=(h, w, 3), img_shape=(h, w, 3),
                  pad_shape=(h, w, 3), scale_factor=1.0, flip=False)]
    gt = np.random.RandomState(1).randint(0, 2, (1, h, w))
    losses = model.forward_train(img, metas, gt)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    preds = model.simple_test(img, metas)
    assert preds[0].shape == (h, w)


def test_maxvit_feature_strides():
    import jax
    from stc_unet_tpu.models import build_backbone
    bb = build_backbone(dict(type='MaxViT', depths=(1, 1, 1, 1),
                             channels=(4, 8, 16, 32), embed_dim=4,
                             num_heads=2, grid_window_size=(2, 2)))
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    variables = bb.init({'params': jax.random.PRNGKey(0),
                         'dropout': jax.random.PRNGKey(1)}, x)
    outs = bb.apply(variables, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 4), (1, 8, 8, 8), (1, 4, 4, 16), (1, 2, 2, 32)]


def test_maxvit_with_cp_equivalence():
    """with_cp=True (per-block nn.remat) must be a pure memory/compute
    trade: identical params tree, outputs, grads and BN stat updates."""
    import jax
    import jax.numpy as jnp
    from stc_unet_tpu.models import build_segmentor

    h = w = 64
    def make(with_cp):
        return build_segmentor(dict(
            type='EncoderDecoder',
            backbone=dict(type='MaxViT', in_channels=3, depths=(1, 1, 1, 1),
                          channels=(8, 8, 8, 8), embed_dim=8, num_heads=2,
                          grid_window_size=(2, 2), attn_drop=0.1, drop=0.1,
                          drop_path=0.1, mlp_ratio=2, with_cp=with_cp),
            decode_head=dict(type='MaxViTDecoder', in_channels=[8, 8, 8, 8],
                             output_size=(32, 32), num_heads=2,
                             grid_window_size=(2, 2), depths=(1, 1, 1),
                             channels=8, num_classes=2, mlp_ratio=2.0,
                             with_cp=with_cp, loss_decode=LOSSES),
            test_cfg=dict(mode='whole')))

    m0, m1 = make(False), make(True)
    m0.init_weights(seed=0, input_size=(h, w))
    variables = m0.variables
    img = jnp.asarray(np.random.RandomState(0).rand(2, h, w, 3), jnp.float32)

    def run(model):
        def loss_fn(params):
            out, upd = model.net.apply(
                {**variables, 'params': params}, img, train=True,
                rngs={'dropout': jax.random.PRNGKey(7)},
                mutable=['batch_stats'])
            sq = sum(jnp.sum(l.astype(jnp.float32) ** 2)
                     for l in jax.tree_util.tree_leaves(out))
            return sq, upd
        (val, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables['params'])
        return val, grads, upd

    # identical param tree structure either way
    v1 = m1.net.init({'params': jax.random.PRNGKey(0),
                      'dropout': jax.random.PRNGKey(1)},
                     img, train=True)
    assert (jax.tree_util.tree_structure(v1['params'])
            == jax.tree_util.tree_structure(variables['params']))

    val0, g0, upd0 = run(m0)
    val1, g1, upd1 = run(m1)
    assert np.allclose(float(val0), float(val1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(upd0),
                    jax.tree_util.tree_leaves(upd1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)
