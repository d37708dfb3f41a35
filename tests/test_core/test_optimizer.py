"""Optimizer/schedule tests: torch-parity of SGD/Adam/AdamW update math."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from stc_unet_tpu.core import build_lr_schedule, build_optimizer_tx


def _params():
    return {'w': jnp.array([1.0, -2.0, 3.0]), 'bias': jnp.array([0.5])}


def _run_steps(tx, params, grads_list):
    state = tx.init(params)
    for g in grads_list:
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    return params


def test_sgd_momentum_matches_torch():
    import torch
    lr, momentum, wd = 0.1, 0.9, 0.01
    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    grads = [np.array([0.1, 0.2, -0.3], np.float32),
             np.array([-0.2, 0.1, 0.4], np.float32)]

    tw = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.SGD([tw], lr=lr, momentum=momentum, weight_decay=wd)
    for g in grads:
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        opt.step()

    tx = build_optimizer_tx(dict(type='SGD', lr=lr, momentum=momentum,
                                 weight_decay=wd))
    jw = {'w': jnp.asarray(w0)}
    jw = _run_steps(tx, jw, [{'w': jnp.asarray(g)} for g in grads])
    np.testing.assert_allclose(np.asarray(jw['w']), tw.detach().numpy(),
                               rtol=1e-5)


@pytest.mark.parametrize('opt_type', ['Adam', 'AdamW'])
def test_adam_matches_torch(opt_type):
    import torch
    lr, wd = 1e-3, 0.01
    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    grads = [np.array([0.1, 0.2, -0.3], np.float32)] * 3

    tw = torch.nn.Parameter(torch.tensor(w0))
    cls = torch.optim.Adam if opt_type == 'Adam' else torch.optim.AdamW
    opt = cls([tw], lr=lr, betas=(0.9, 0.999), weight_decay=wd)
    for g in grads:
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        opt.step()

    tx = build_optimizer_tx(dict(type=opt_type, lr=lr, betas=(0.9, 0.999),
                                 weight_decay=wd))
    jw = {'w': jnp.asarray(w0)}
    jw = _run_steps(tx, jw, [{'w': jnp.asarray(g)} for g in grads])
    np.testing.assert_allclose(np.asarray(jw['w']), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-7)


def test_paramwise_custom_keys():
    params = _params()
    tx = build_optimizer_tx(
        dict(type='SGD', lr=1.0, paramwise_cfg=dict(
            custom_keys={'bias': dict(lr_mult=0.0)})),
        params=params)
    grads = {'w': jnp.ones(3), 'bias': jnp.ones(1)}
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates['bias']).sum()) == 0.0
    assert float(jnp.abs(updates['w']).sum()) > 0.0


def test_poly_schedule():
    # reference my_config lr_config: poly, power=0.9, min_lr=1e-6, by_epoch
    sched = build_lr_schedule(
        dict(policy='poly', power=0.9, min_lr=1e-6, by_epoch=False),
        base_lr=1e-2, max_iters=100)
    assert np.isclose(float(sched(0)), 1e-2)
    mid = float(sched(50))
    assert 1e-6 < mid < 1e-2
    expected = (1e-2 - 1e-6) * (0.5 ** 0.9) + 1e-6
    assert np.isclose(mid, expected, rtol=1e-5)
    assert np.isclose(float(sched(100)), 1e-6, rtol=1e-3)


def test_poly_by_epoch_quantized():
    sched = build_lr_schedule(
        dict(policy='poly', power=1.0, min_lr=0.0, by_epoch=True),
        base_lr=1.0, max_iters=100, iters_per_epoch=10)
    # constant within an epoch
    assert float(sched(10)) == float(sched(19))
    assert float(sched(10)) != float(sched(20))


def test_warmup_linear():
    sched = build_lr_schedule(
        dict(policy='fixed', warmup='linear', warmup_iters=10,
             warmup_ratio=0.1, by_epoch=False),
        base_lr=1.0, max_iters=100)
    assert np.isclose(float(sched(0)), 0.1)
    assert float(sched(5)) < 1.0
    assert np.isclose(float(sched(10)), 1.0)


def test_step_schedule():
    sched = build_lr_schedule(
        dict(policy='step', step=[30, 60], gamma=0.1, by_epoch=False),
        base_lr=1.0, max_iters=100)
    assert np.isclose(float(sched(0)), 1.0)
    assert np.isclose(float(sched(30)), 0.1)
    assert np.isclose(float(sched(60)), 0.01, rtol=1e-5)


def test_schedule_is_jittable():
    sched = build_lr_schedule(
        dict(policy='poly', power=0.9, min_lr=1e-6, by_epoch=False),
        base_lr=1e-2, max_iters=100)
    f = jax.jit(sched)
    assert np.isfinite(float(f(jnp.asarray(3))))


def test_custom_registered_optimizer():
    """User-registered optimizer (statistics-only contract): lr schedule,
    decay and sign stay the framework's; the registry entry supplies the
    optax statistics transform (directly or via ``.tx``)."""
    import optax
    from stc_unet_tpu.core import OPTIMIZERS, build_optimizer_tx

    @OPTIMIZERS.register_module()
    class SignSGD:
        def __init__(self, momentum=0.0):
            assert momentum == 0.0
            self.tx = optax.GradientTransformation(
                lambda params: optax.EmptyState(),
                lambda updates, state, params=None: (
                    jax.tree_util.tree_map(jnp.sign, updates), state))

    try:
        tx = build_optimizer_tx(dict(type='SignSGD', lr=0.1, momentum=0.0))
        params = {'w': jnp.asarray([1.0, -2.0])}
        grads = {'w': jnp.asarray([0.3, -7.0])}
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        np.testing.assert_allclose(np.asarray(updates['w']),
                                   [-0.1, 0.1], rtol=1e-6)
    finally:
        OPTIMIZERS._module_dict.pop('SignSGD', None)


def test_custom_registered_optimizer_type_error():
    from stc_unet_tpu.core import OPTIMIZERS, build_optimizer_tx

    @OPTIMIZERS.register_module()
    class NotATransform:
        def __init__(self):
            self.tx = 42

    try:
        with pytest.raises(TypeError, match='GradientTransformation'):
            build_optimizer_tx(dict(type='NotATransform', lr=0.1))
    finally:
        OPTIMIZERS._module_dict.pop('NotATransform', None)
