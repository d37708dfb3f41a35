"""Parity tests for the fused Pallas windowed-attention kernel
(``stc_unet_tpu/ops/window_attention.py``) against the plain-XLA einsum
formulation (the reference semantics of ``maxvit_encoder.py:244``).

Run under the Pallas interpreter on CPU; the same kernel compiles on TPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stc_unet_tpu.ops.window_attention import (window_attention,
                                               window_attention_reference)


def _inputs(w=4, n=16, heads=4, d=2, seed=0):
    rng = np.random.RandomState(seed)
    c = heads * d
    q, k, v = (jnp.asarray(rng.randn(w, n, c), jnp.float32)
               for _ in range(3))
    bias = jnp.asarray(rng.randn(heads, n, n) * 0.1, jnp.float32)
    return q, k, v, bias, c


def _bias_e(bias):
    h, n, _ = bias.shape
    return bias.transpose(1, 0, 2).reshape(n, h * n)


@pytest.mark.parametrize('heads,d,n', [(4, 2, 16), (2, 8, 8), (8, 4, 32)])
def test_forward_parity(heads, d, n):
    q, k, v, bias, c = _inputs(w=4, n=n, heads=heads, d=d)
    scale = heads ** -0.5
    ref = window_attention_reference(q, k, v, bias, heads, scale)
    out = window_attention(q, k, v, _bias_e(bias),
                           jnp.zeros((1,), jnp.int32), heads, scale,
                           0.0, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_grad_parity():
    q, k, v, bias, c = _inputs(w=2, n=16, heads=4, d=4, seed=3)
    scale = 4 ** -0.5
    seed = jnp.zeros((1,), jnp.int32)

    def loss_fused(q, k, v, bias):
        out = window_attention(q, k, v, _bias_e(bias), seed, 4, scale,
                               0.0, True)
        return jnp.sum(out * out)

    def loss_ref(q, k, v, bias):
        out = window_attention_reference(q, k, v, bias, 4, scale)
        return jnp.sum(out * out)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, name in zip(g_fused, g_ref, 'qkvb'):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f'grad d{name}')


_TPU_ONLY = pytest.mark.skipif(
    jax.default_backend() != 'tpu',
    reason='pltpu.prng_* has no CPU interpret rule in this jax version; '
           'the dropout path is validated on-chip by '
           'tools/probe_fused_attention.py (docs/data/fused_attn_probe.json)')


@_TPU_ONLY
def test_dropout_determinism_and_rate():
    q, k, v, bias, c = _inputs(w=4, n=16, heads=4, d=4, seed=1)
    scale = 4 ** -0.5
    seed = jnp.asarray([123], jnp.int32)
    args = (q, k, v, _bias_e(bias), seed, 4, scale, 0.5, True)
    o1 = window_attention(*args)
    o2 = window_attention(*args)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = window_attention(q, k, v, _bias_e(bias),
                          jnp.asarray([7], jnp.int32), 4, scale, 0.5, True)
    assert not np.allclose(np.asarray(o1), np.asarray(o3))
    # expectation preserved: mean over many seeds approaches the no-drop out
    outs = [window_attention(q, k, v, _bias_e(bias),
                             jnp.asarray([s], jnp.int32), 4, scale, 0.5,
                             True) for s in range(24)]
    mean = np.mean([np.asarray(o) for o in outs], axis=0)
    nodrop = np.asarray(window_attention(
        q, k, v, _bias_e(bias), seed, 4, scale, 0.0, True))
    corr = np.corrcoef(mean.ravel(), nodrop.ravel())[0, 1]
    assert corr > 0.95, corr


@_TPU_ONLY
def test_dropout_bwd_reuses_fwd_mask():
    """grad of sum(out) w.r.t. v for a fixed seed must equal the column sums
    of the (dropped, normalised) attention matrix — only true when the bwd
    kernel regenerates exactly the fwd mask."""
    q, k, v, bias, c = _inputs(w=2, n=8, heads=2, d=4, seed=2)
    scale = 2 ** -0.5
    seed = jnp.asarray([11], jnp.int32)

    def f(v):
        return jnp.sum(window_attention(q, k, v, _bias_e(bias), seed, 2,
                                        scale, 0.4, True))

    g = jax.grad(f)(v)
    # finite difference along a random direction
    rng = np.random.RandomState(0)
    dv = jnp.asarray(rng.randn(*v.shape), jnp.float32)
    eps = 1e-3
    fd = (f(v + eps * dv) - f(v - eps * dv)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, dv)), float(fd),
                               rtol=1e-3, atol=1e-3)
