"""Layer-decay optimizer constructor tests."""
import jax.numpy as jnp
import numpy as np

from stc_unet_tpu.core import (LearningRateDecayOptimizerConstructor,
                               layer_decay_multipliers)


def _fake_vit_params():
    return {
        'backbone': {
            'patch_embed': {'kernel': jnp.ones((2, 2))},
            'layers_0': {'fc1': {'kernel': jnp.ones((2, 2)),
                                 'bias': jnp.ones(2)}},
            'layers_5': {'fc1': {'kernel': jnp.ones((2, 2))}},
        },
        'decode_head': {'conv_seg': {'kernel': jnp.ones((2, 2))}},
    }


def test_layer_decay_ordering():
    params = _fake_vit_params()
    lr, wd = layer_decay_multipliers(params, num_layers=6, decay_rate=0.9)
    # deeper layers get bigger multipliers; patch_embed smallest
    assert lr['backbone']['patch_embed']['kernel'] < \
        lr['backbone']['layers_0']['fc1']['kernel'] < \
        lr['backbone']['layers_5']['fc1']['kernel']
    # head gets the max multiplier (last layer id → decay^0 = 1)
    assert np.isclose(lr['decode_head']['conv_seg']['kernel'], 1.0)
    # biases skip decay
    assert wd['backbone']['layers_0']['fc1']['bias'] == 0.0
    assert wd['backbone']['layers_0']['fc1']['kernel'] == 1.0


def test_constructor_builds_tx():
    import optax
    params = _fake_vit_params()
    ctor = LearningRateDecayOptimizerConstructor(
        dict(type='AdamW', lr=1e-3, weight_decay=0.05),
        dict(num_layers=6, decay_rate=0.9))
    tx = ctor(params)
    state = tx.init(params)
    g = jnp.ones((2, 2))
    grads = {
        'backbone': {'patch_embed': {'kernel': g},
                     'layers_0': {'fc1': {'kernel': g, 'bias': jnp.ones(2)}},
                     'layers_5': {'fc1': {'kernel': g}}},
        'decode_head': {'conv_seg': {'kernel': g}},
    }
    updates, _ = tx.update(grads, state, params)
    u_shallow = float(jnp.abs(
        updates['backbone']['patch_embed']['kernel']).mean())
    u_deep = float(jnp.abs(
        updates['backbone']['layers_5']['fc1']['kernel']).mean())
    assert u_shallow < u_deep


def test_build_optimizer_tx_dispatches_constructors():
    """convnext/beit/mae zoo cfgs set constructor=...; build_optimizer_tx
    must route to the layer-decay constructors instead of raising."""
    import jax
    from stc_unet_tpu.core import build_optimizer_tx
    params = {'backbone': {'layers_0': {'w': jnp.ones((3, 3))},
                           'norm': {'scale': jnp.ones((3,))}}}
    for ctor, pw in [
            ('LearningRateDecayOptimizerConstructor',
             dict(decay_rate=0.9, decay_type='stage_wise', num_layers=2)),
            ('LayerDecayOptimizerConstructor',
             dict(layer_decay_rate=0.65, num_layers=2))]:
        cfg = dict(type='AdamW', lr=1e-4, betas=(0.9, 0.999),
                   weight_decay=0.05, constructor=ctor, paramwise_cfg=pw)
        tx = build_optimizer_tx(cfg, params=params)
        state = tx.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        assert np.isfinite(float(jnp.sum(updates['backbone']['layers_0']['w'])))
