"""Golden parity tests for conv/norm/pool bricks vs torch (CPU oracle)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from stc_unet_tpu.models.bricks import (
    BatchNorm, Conv2d, ConvModule, ConvTranspose2d, Dropout2d, Linear,
    adaptive_avg_pool2d, avg_pool2d, build_activation_layer, h_sigmoid,
    h_swish, max_pool2d, pad_hw)


def to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def to_nchw_t(x):
    return torch.from_numpy(np.transpose(np.asarray(x), (0, 3, 1, 2)))


@pytest.mark.parametrize('k,s,p,d,g', [
    (3, 1, 1, 1, 1), (1, 1, 0, 1, 1), (5, 2, 2, 1, 1), (3, 1, 2, 2, 1),
    (3, 1, 1, 1, 4), (7, 2, 3, 1, 1),
])
def test_conv2d_parity(k, s, p, d, g):
    rng = np.random.RandomState(0)
    cin, cout = 8, 12
    x = rng.randn(2, 9, 11, cin).astype(np.float32)
    tconv = tnn.Conv2d(cin, cout, k, stride=s, padding=p, dilation=d, groups=g)
    ref = to_nhwc(tconv(to_nchw_t(x)))

    m = Conv2d(cout, k, s, p, d, g, use_bias=True)
    params = m.init(jax.random.PRNGKey(0), x)
    # load torch weights: OIHW -> HWIO (grouped: flax expects HW, Cin/g, Cout)
    w = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    params = {'params': {'conv': {'kernel': w, 'bias': tconv.bias.detach().numpy()}}}
    ours = np.asarray(m.apply(params, x))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_conv_transpose2d_parity():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 5, 7, 4).astype(np.float32)
    tconv = tnn.ConvTranspose2d(4, 6, 2, stride=2)
    ref = to_nhwc(tconv(to_nchw_t(x)))
    m = ConvTranspose2d(6, 2, 2)
    # torch ConvTranspose weight is (in, out, kh, kw) -> flax (kh,kw,in,out)
    # with spatial dims FLIPPED (flax ConvTranspose does not flip the kernel;
    # torch's op is the conv gradient, which does).
    w = tconv.weight.detach().numpy().transpose(2, 3, 0, 1)[::-1, ::-1].copy()
    params = {'params': {'conv': {'kernel': w, 'bias': tconv.bias.detach().numpy()}}}
    ours = np.asarray(m.apply(params, x))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_batchnorm_train_eval_parity():
    rng = np.random.RandomState(2)
    c = 6
    x1 = rng.randn(4, 5, 5, c).astype(np.float32)
    x2 = rng.randn(4, 5, 5, c).astype(np.float32)
    tbn = tnn.BatchNorm2d(c)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(rng.rand(c).astype(np.float32) + 0.5))
        tbn.bias.copy_(torch.from_numpy(rng.randn(c).astype(np.float32)))

    m = BatchNorm()
    variables = {
        'params': {'scale': tbn.weight.detach().numpy(),
                   'bias': tbn.bias.detach().numpy()},
        'batch_stats': {'mean': tbn.running_mean.numpy().copy(),
                        'var': tbn.running_var.numpy().copy()},
    }
    # two training steps: outputs and running-stat updates must match
    for x in (x1, x2):
        tbn.train()
        ref = to_nhwc(tbn(to_nchw_t(x)))
        ours, updated = m.apply(variables, x, train=True, mutable=['batch_stats'])
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)
        variables = {'params': variables['params'],
                     'batch_stats': updated['batch_stats']}
    np.testing.assert_allclose(
        np.asarray(variables['batch_stats']['mean']),
        tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(variables['batch_stats']['var']),
        tbn.running_var.numpy(), rtol=1e-4, atol=1e-5)
    # eval mode
    tbn.eval()
    ref = to_nhwc(tbn(to_nchw_t(x1)))
    ours = m.apply(variables, x1, train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('shape', [(1, 8, 8, 3), (2, 9, 7, 4), (1, 5, 5, 2)])
def test_max_pool_parity(shape):
    x = np.random.RandomState(3).randn(*shape).astype(np.float32)
    ref = to_nhwc(F.max_pool2d(to_nchw_t(x), 2))
    ours = np.asarray(max_pool2d(x, 2))
    np.testing.assert_allclose(ours, ref)


@pytest.mark.parametrize('out', [1, 2, 3, 6, (None, 1), (1, None), (2, 5)])
def test_adaptive_avg_pool_parity(out):
    x = np.random.RandomState(4).randn(2, 13, 9, 4).astype(np.float32)
    ref = to_nhwc(F.adaptive_avg_pool2d(
        to_nchw_t(x), out if isinstance(out, tuple) else (out, out)))
    ours = np.asarray(adaptive_avg_pool2d(x, out))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_avg_pool_parity():
    x = np.random.RandomState(5).randn(1, 8, 8, 3).astype(np.float32)
    ref = to_nhwc(F.avg_pool2d(to_nchw_t(x), 3, stride=2, padding=1))
    ours = np.asarray(avg_pool2d(x, 3, 2, 1))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
    ref2 = to_nhwc(F.avg_pool2d(to_nchw_t(x), 3, stride=2, padding=1,
                                count_include_pad=False))
    ours2 = np.asarray(avg_pool2d(x, 3, 2, 1, count_include_pad=False))
    np.testing.assert_allclose(ours2, ref2, rtol=1e-5, atol=1e-6)


def test_h_activations_parity():
    x = np.linspace(-5, 5, 101).astype(np.float32)
    np.testing.assert_allclose(np.asarray(h_sigmoid(x)),
                               (F.relu6(torch.from_numpy(x) + 3) / 6).numpy(),
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(h_swish(x)),
        (torch.from_numpy(x) * F.relu6(torch.from_numpy(x) + 3) / 6).numpy(),
        rtol=1e-6, atol=1e-6)


def test_activation_factory():
    x = jnp.array([-2.0, 0.5, 3.0])
    assert np.allclose(np.asarray(build_activation_layer(dict(type='ReLU'))(x)),
                       [0, 0.5, 3])
    silu = build_activation_layer(dict(type='SiLU'))
    ref = torch.nn.functional.silu(torch.tensor([-2.0, 0.5, 3.0])).numpy()
    np.testing.assert_allclose(np.asarray(silu(x)), ref, rtol=1e-5)
    with pytest.raises(KeyError):
        build_activation_layer(dict(type='Nope'))


def test_conv_module_bias_auto_and_order():
    x = np.random.RandomState(6).randn(1, 6, 6, 3).astype(np.float32)
    m = ConvModule(8, 3, padding=1, norm_cfg=dict(type='BN'),
                   act_cfg=dict(type='ReLU'))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    assert 'bias' not in v['params']['conv_m']['conv']  # bias auto-off w/ norm
    assert 'batch_stats' in v
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 6, 6, 8)
    assert float(jnp.min(y)) >= 0.0  # ReLU applied

    m2 = ConvModule(8, 3, padding=1, act_cfg=dict(type='ReLU'))
    v2 = m2.init(jax.random.PRNGKey(0), x)
    assert 'bias' in v2['params']['conv_m']['conv']


def test_pad_hw_parity():
    x = np.random.RandomState(7).randn(1, 4, 5, 2).astype(np.float32)
    ref = to_nhwc(F.pad(to_nchw_t(x), (1, 2, 3, 0)))
    ours = np.asarray(pad_hw(x, (1, 2, 3, 0)))
    np.testing.assert_allclose(ours, ref)


def test_dropout2d_drops_whole_channels():
    x = jnp.ones((2, 4, 4, 8))
    m = Dropout2d(0.5)
    v = m.init({'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
               x, train=True)
    y = m.apply(v, x, train=True, rngs={'dropout': jax.random.PRNGKey(2)})
    y = np.asarray(y)
    per_channel = y.reshape(2, -1, 8)
    for b in range(2):
        for c in range(8):
            vals = np.unique(per_channel[b, :, c])
            assert len(vals) == 1  # whole channel kept or dropped
    y_eval = m.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y_eval), np.asarray(x))


def test_linear_parity():
    x = np.random.RandomState(8).randn(3, 7).astype(np.float32)
    tl = tnn.Linear(7, 4)
    m = Linear(4)
    params = {'params': {'linear': {'kernel': tl.weight.detach().numpy().T,
                                    'bias': tl.bias.detach().numpy()}}}
    ours = np.asarray(m.apply(params, x))
    np.testing.assert_allclose(ours, tl(torch.from_numpy(x)).detach().numpy(),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('k,s,p,op', [(3, 2, 1, 1), (3, 1, 1, 0),
                                      (2, 2, 0, 0), (4, 2, 1, 0)])
def test_conv_transpose2d_output_padding_parity(k, s, p, op):
    """torch output_padding semantics (LinkNet decoders use k3/s2/p1/op1)."""
    rng = np.random.RandomState(2)
    x = rng.randn(1, 6, 5, 3).astype(np.float32)
    tconv = tnn.ConvTranspose2d(3, 4, k, stride=s, padding=p,
                                output_padding=op)
    ref = to_nhwc(tconv(to_nchw_t(x)))
    m = ConvTranspose2d(4, k, s, padding=p, output_padding=op)
    w = tconv.weight.detach().numpy().transpose(2, 3, 0, 1)[::-1, ::-1].copy()
    params = {'params': {'conv': {'kernel': w,
                                  'bias': tconv.bias.detach().numpy()}}}
    ours = np.asarray(m.apply(params, x))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
