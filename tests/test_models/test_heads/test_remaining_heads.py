"""Dedicated tests for the remaining registered heads: CCHead,
DepthwiseSeparableFCNHead, OCRHead standalone, UnetHead shape contract,
KernelUpdateHead/KernelUpdator built standalone from the registry
(≙ reference tests/test_models/test_heads per-file granularity)."""
import jax
import jax.numpy as jnp
import numpy as np

from stc_unet_tpu.models.builder import HEADS, build_head


def _run_head(cfg, feats, train=False):
    head = build_head(cfg)
    variables = head.init(jax.random.PRNGKey(0), feats, train=True)
    if train:
        out, _ = head.apply(variables, feats, train=True,
                            mutable=['batch_stats'],
                            rngs={'dropout': jax.random.PRNGKey(1)})
        return out
    return head.apply(variables, feats, train=False)


def test_cc_head_recurrence():
    feats = [jnp.ones((1, 8, 8, 16))]
    out = _run_head(dict(type='CCHead', in_channels=16, channels=8,
                         num_classes=3, recurrence=2, in_index=0,
                         norm_cfg=dict(type='BN')), feats)
    assert out.shape == (1, 8, 8, 3)
    # recurrence is a static cfg branch: 1-pass differs structurally but
    # must keep the shape contract
    out1 = _run_head(dict(type='CCHead', in_channels=16, channels=8,
                          num_classes=3, recurrence=1, in_index=0,
                          norm_cfg=dict(type='BN')), feats)
    assert out1.shape == out.shape


def test_depthwise_separable_fcn_head():
    feats = [jnp.ones((1, 8, 8, 16))]
    out = _run_head(dict(type='DepthwiseSeparableFCNHead', in_channels=16,
                         channels=8, num_classes=4, num_convs=2, in_index=0,
                         norm_cfg=dict(type='BN')), feats)
    assert out.shape == (1, 8, 8, 4)


def test_ocr_head_standalone():
    """OCRHead outside the cascade wrapper: takes feats + prev logits."""
    head = build_head(dict(type='OCRHead', in_channels=16, channels=8,
                           ocr_channels=8, num_classes=3, in_index=0,
                           norm_cfg=dict(type='BN')))
    feats = [jnp.ones((1, 8, 8, 16))]
    prev = jnp.ones((1, 8, 8, 3))
    variables = head.init(jax.random.PRNGKey(0), feats, prev, train=True)
    out = head.apply(variables, feats, prev, train=False)
    assert out.shape == (1, 8, 8, 3)


def test_unet_head_shape_contract():
    ch = [4, 8, 8, 8]
    # 5 encoder scales: /1, /2, /4, /8, /16 with channels [c0,c1,c2,c3,c3]
    feats = [jnp.ones((1, 32 // 2 ** i, 32 // 2 ** i, c))
             for i, c in enumerate(ch + [ch[-1]])]
    out = _run_head(dict(type='UnetHead', num_classes=2, channels=4,
                         decoder_channel=[16, 16, 16, 16, 4],
                         loss_decode=dict(type='CrossEntropyLoss')), feats)
    assert out.shape == (1, 32, 32, 2)


def test_kernel_update_head_standalone_from_registry():
    """A custom KNet variant builds KernelUpdateHead directly from HEADS
    (reference registers it in __all__)."""
    head = HEADS.build(dict(type='KernelUpdateHead', num_classes=3,
                            in_channels=8, out_channels=8, num_heads=2,
                            feedforward_channels=16))
    x = jnp.ones((1, 8, 8, 8))
    kernels = jnp.ones((1, 3, 8))
    masks = jnp.ones((1, 8, 8, 3))
    variables = head.init(jax.random.PRNGKey(0), x, kernels, masks,
                          train=False)
    new_masks, new_kernels = head.apply(variables, x, kernels, masks,
                                        train=False)
    assert new_masks.shape == (1, 8, 8, 3)
    assert new_kernels.shape == (1, 3, 8)


def test_kernel_updator_standalone_from_registry():
    m = HEADS.build(dict(type='KernelUpdator', in_channels=8,
                         feat_channels=8))
    update_feat = jnp.ones((4, 8))
    input_feat = jnp.ones((4, 8))
    variables = m.init(jax.random.PRNGKey(0), update_feat, input_feat)
    out = m.apply(variables, update_feat, input_feat)
    assert out.shape == (4, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_knet_iterative_head_train_loss():
    """KNet end-to-end train loss through the iterative head (stage losses
    aggregated; reference knet_head.py losses path)."""
    import numpy as np
    from stc_unet_tpu.models import build_segmentor
    cfg = dict(
        type='EncoderDecoder',
        backbone=dict(type='UnetBackbone', in_channels=3,
                      channel_list=[4, 8, 8, 8]),
        decode_head=dict(
            type='IterativeDecodeHead', num_stages=1,
            kernel_generate_head=dict(
                type='FCNHead', in_channels=8, in_index=4, channels=8,
                num_convs=1, concat_input=False, num_classes=3,
                loss_decode=dict(type='CrossEntropyLoss')),
            kernel_update_head=[dict(
                type='KernelUpdateHead', num_classes=3, num_heads=2,
                in_channels=8, out_channels=8, feedforward_channels=16)]),
        test_cfg=dict(mode='whole'))
    model = build_segmentor(cfg)
    model.init_weights(seed=0, input_size=(32, 32))
    img = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    gt = np.random.RandomState(1).randint(0, 3, (1, 32, 32))
    metas = [dict(ori_shape=(32, 32, 3), img_shape=(32, 32, 3),
                  pad_shape=(32, 32, 3), scale_factor=1.0, flip=False)]
    losses = model.forward_train(img, metas, gt_semantic_seg=gt)
    total = sum(float(jnp.mean(v)) for k, v in losses.items() if 'loss' in k)
    assert np.isfinite(total)
