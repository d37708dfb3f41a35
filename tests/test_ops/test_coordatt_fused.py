"""Parity tests for the fused CoordAtt gate kernels
(``stc_unet_tpu/ops/coordatt_fused.py``) against the plain-XLA chain —
the strip-pool means and the additive outer-product gate of the
reference CoordAtt (``unet_head.py:116-146``, ``:56``).

Run under the Pallas interpreter on CPU; the same kernels compile on TPU
(real-chip timings: ``docs/data/coordatt_fused_probe.json``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stc_unet_tpu.ops.coordatt_fused import (gate_add, gate_add_reference,
                                             strip_pools,
                                             strip_pools_reference)


def _x(n=2, h=8, w=16, c=24, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(n, h, w, c), dtype)


@pytest.mark.parametrize('n,h,w,c', [(2, 8, 16, 24), (1, 16, 8, 128),
                                     (3, 4, 4, 8)])
def test_strip_pools_forward(n, h, w, c):
    x = _x(n, h, w, c)
    sh, sw = strip_pools(x, True)
    eh, ew = strip_pools_reference(x)
    np.testing.assert_allclose(np.asarray(sh), np.asarray(eh), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sw), np.asarray(ew), rtol=1e-5,
                               atol=1e-5)


def test_strip_pools_bf16_accumulates_f32():
    x = _x(1, 8, 8, 16, dtype=jnp.bfloat16)
    sh, sw = strip_pools(x, True)
    assert sh.dtype == jnp.float32 and sw.dtype == jnp.float32
    eh, ew = strip_pools_reference(x)
    np.testing.assert_allclose(np.asarray(sh), np.asarray(eh), rtol=1e-2,
                               atol=1e-2)


def test_strip_pools_grad():
    x = _x(2, 4, 8, 16)

    def loss_k(x):
        sh, sw = strip_pools(x, True)
        return jnp.sum(jnp.sin(sh)) + jnp.sum(sw * sw)

    def loss_r(x):
        sh, sw = strip_pools_reference(x)
        return jnp.sum(jnp.sin(sh)) + jnp.sum(sw * sw)

    gk = jax.grad(loss_k)(x)
    gr = jax.grad(loss_r)(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize('n,h,w,c', [(2, 8, 16, 24), (1, 16, 8, 128)])
def test_gate_add_forward(n, h, w, c):
    rng = np.random.RandomState(1)
    x = _x(n, h, w, c)
    a_h = jnp.asarray(rng.rand(n, h, c), jnp.float32)
    a_w = jnp.asarray(rng.rand(n, w, c), jnp.float32)
    out = gate_add(x, a_h, a_w, True)
    ref = gate_add_reference(x, a_h, a_w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_gate_add_grad():
    rng = np.random.RandomState(2)
    n, h, w, c = 2, 4, 8, 16
    x = _x(n, h, w, c)
    a_h = jnp.asarray(rng.rand(n, h, c), jnp.float32)
    a_w = jnp.asarray(rng.rand(n, w, c), jnp.float32)

    def loss_k(x, a_h, a_w):
        return jnp.sum(jnp.tanh(gate_add(x, a_h, a_w, True)))

    def loss_r(x, a_h, a_w):
        return jnp.sum(jnp.tanh(gate_add_reference(x, a_h, a_w)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, a_h, a_w)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, a_h, a_w)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_coordatt_residual_matches_gate_plus_x():
    """CoordAtt(residual=True) on the (CPU) fallback path must equal
    gate + x exactly — the Up-stage contract the fused path replicates."""
    from stc_unet_tpu.models.decode_heads.unet_head import CoordAtt
    x = _x(2, 8, 8, 16)
    mod = CoordAtt(16)
    var = mod.init(jax.random.PRNGKey(0), x)
    gate = mod.apply(var, x)
    res = mod.apply(var, x, residual=True)
    np.testing.assert_allclose(np.asarray(res), np.asarray(gate + x),
                               rtol=0, atol=0)


def test_coordatt_fused_disabled_on_cpu():
    from stc_unet_tpu.ops.coordatt_fused import coordatt_fused_enabled
    if jax.default_backend() == 'cpu':
        assert not coordatt_fused_enabled()
