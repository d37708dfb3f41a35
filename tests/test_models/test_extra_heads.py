"""Forward/shape tests for the fork's extra live heads (reference
``decode_heads/{resunet_decoder,linknet,MultiResUnet_head,carunet_head}.py``)
plus HEADS-registry parity for KernelUpdateHead/KernelUpdator."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stc_unet_tpu.models.builder import HEADS, build_head


def _forward(head, x, train=False):
    variables = head.init(jax.random.PRNGKey(0), x, train=True)
    if train:
        out, _ = head.apply(variables, x, train=True,
                            mutable=['batch_stats'],
                            rngs={'dropout': jax.random.PRNGKey(1)})
        return out
    return head.apply(variables, x, train=False)


def test_registry_has_all_reference_live_heads():
    for name in ['ResUNet', 'CARUnet', 'LinkNet', 'MultiResUnet',
                 'KernelUpdateHead', 'KernelUpdator']:
        assert name in HEADS, f'{name} missing from HEADS'


def test_resunet_forward():
    head = build_head(dict(type='ResUNet', filters=[8, 16, 16, 16],
                           num_classes=2, channels=8))
    x = jnp.zeros((1, 32, 32, 3))
    out = _forward(head, x)
    # hardwired 2-channel sigmoid output (reference quirk)
    assert out.shape == (1, 32, 32, 2)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_linknet_forward():
    head = build_head(dict(type='LinkNet', n_classes=4, num_classes=4,
                           channels=8))
    x = jnp.zeros((1, 64, 64, 3))
    out = _forward(head, x)
    assert out.shape == (1, 64, 64, 4)
    # log-softmax output: rows sum to 1 in prob space
    probs = np.exp(np.asarray(out))
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)


def test_multiresunet_forward_binary_and_multiclass():
    x = jnp.zeros((1, 32, 32, 3))
    head = build_head(dict(type='MultiResUnet', filters=4, nclasses=1,
                           num_classes=2, channels=3, threshold=0.5))
    out = _forward(head, x)
    assert out.shape == (1, 32, 32, 1)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0  # sigmoid
    head = build_head(dict(type='MultiResUnet', filters=4, nclasses=3,
                           num_classes=3, channels=3))
    assert _forward(head, x).shape == (1, 32, 32, 3)


@pytest.mark.parametrize('kwargs', [
    dict(),                      # MecaBlock gating
    dict(ca=True),               # CoordAtt gating
    dict(denseaspp=True),        # DenseASPP bridge
    dict(densecadrb=True),       # dense blocks
], ids=['meca', 'coordatt', 'denseaspp', 'densecadrb'])
def test_carunet_forward_variants(kwargs):
    head = build_head(dict(type='CARUnet', num_classes=2, channels=16,
                           **kwargs))
    x = jnp.zeros((1, 32, 32, 3))
    out = _forward(head, x, train=True)
    assert out.shape == (1, 32, 32, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_skattention_block():
    from stc_unet_tpu.models.decode_heads import SKAttention
    m = SKAttention(kernels=(1, 3))
    x = jnp.ones((2, 8, 8, 16))
    variables = m.init(jax.random.PRNGKey(0), x, train=True)
    out = m.apply(variables, x, train=False)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_extra_heads_train_loss_finite():
    """Heads must train through the standard loss path (forward_train)."""
    from stc_unet_tpu.models import build_segmentor
    cfg = dict(
        type='EncoderDecoderFull',
        decode_head=dict(type='CARUnet', num_classes=2, channels=16,
                         loss_decode=dict(type='CrossEntropyLoss')),
        test_cfg=dict(mode='whole'))
    model = build_segmentor(cfg)
    model.init_weights(seed=0, input_size=(32, 32))
    img = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    gt = np.random.RandomState(1).randint(0, 2, (2, 32, 32))
    metas = [dict(ori_shape=(32, 32, 3), img_shape=(32, 32, 3),
                  pad_shape=(32, 32, 3), scale_factor=1.0, flip=False)
             for _ in range(2)]
    losses = model.forward_train(img, metas, gt_semantic_seg=gt)
    total = sum(float(jnp.mean(v)) for k, v in losses.items()
                if 'loss' in k)
    assert np.isfinite(total)
