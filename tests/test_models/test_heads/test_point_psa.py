"""PointHead / PSAHead / JPU tests."""
import jax
import numpy as np

from stc_unet_tpu.models import build_head, build_neck


def test_psa_head():
    head = build_head(dict(type='PSAHead', in_channels=16, channels=8,
                           num_classes=3, mask_size=(4, 4),
                           norm_cfg=dict(type='BN'), in_index=0))
    x = [np.random.RandomState(0).rand(1, 8, 8, 16).astype(np.float32)]
    v = head.init({'params': jax.random.PRNGKey(0),
                   'dropout': jax.random.PRNGKey(1)}, x)
    out = head.apply(v, x)
    assert out.shape == (1, 8, 8, 3)


def test_point_head_train_loss():
    head = build_head(dict(type='PointHead', in_channels=[8], channels=8,
                           num_classes=3, num_fcs=2, num_points=16,
                           oversample_ratio=2, importance_sample_ratio=0.5,
                           in_index=[0],
                           loss_decode=dict(type='CrossEntropyLoss')))
    feats = [np.random.RandomState(0).rand(2, 8, 8, 8).astype(np.float32)]
    coarse = np.random.RandomState(1).rand(2, 8, 8, 3).astype(np.float32)
    v = head.init({'params': jax.random.PRNGKey(0),
                   'dropout': jax.random.PRNGKey(1)}, feats, coarse,
                  train=False)
    logits, points = head.apply(v, feats, coarse, train=True,
                                rngs={'dropout': jax.random.PRNGKey(2)})
    assert logits.shape == (2, 16, 3)
    assert points.shape == (2, 16, 2)
    labels = np.random.RandomState(2).randint(0, 3, (2, 16, 16))
    losses = head.loss_by_feat((logits, points), labels)
    assert any('loss' in k for k in losses)
    for k, val in losses.items():
        assert np.isfinite(float(val)), k


def test_point_sample_matches_resize():
    """Sampling a feature at a dense grid ≈ the feature itself."""
    from stc_unet_tpu.models.decode_heads.point_head import point_sample
    feats = np.random.RandomState(0).rand(1, 4, 4, 2).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(4), np.arange(4), indexing='ij')
    pts = np.stack([(xs.ravel() + 0.5) / 4, (ys.ravel() + 0.5) / 4],
                   axis=-1)[None].astype(np.float32)
    out = np.asarray(point_sample(feats, pts)).reshape(1, 4, 4, 2)
    np.testing.assert_allclose(out, feats, atol=1e-5)


def test_jpu_neck():
    neck = build_neck(dict(type='JPU', in_channels=(8, 16, 32),
                           mid_channels=8, norm_cfg=dict(type='BN')))
    ins = [np.random.RandomState(0).rand(1, 8, 8, 8).astype(np.float32),
           np.random.RandomState(1).rand(1, 4, 4, 16).astype(np.float32),
           np.random.RandomState(2).rand(1, 2, 2, 32).astype(np.float32)]
    v = neck.init(jax.random.PRNGKey(0), ins)
    outs = neck.apply(v, ins)
    assert len(outs) == 3
    assert outs[-1].shape == (1, 8, 8, 32)  # 4 dilation branches x 8
