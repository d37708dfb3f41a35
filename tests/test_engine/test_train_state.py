"""Engine train-step regressions (mesh guard; see
stc_unet_tpu/engine/train_state.py)."""
def test_single_device_mesh_uses_plain_jit_semantics():
    """A 1-device mesh must behave identically to mesh=None (the SPMD
    partitioner path is skipped — it costs 20x on single-chip platforms)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from stc_unet_tpu.engine import (TrainState, default_data_mesh,
                                     make_train_step)
    from stc_unet_tpu.models import build_segmentor

    cfg = dict(
        type='EncoderDecoder',
        backbone=dict(type='UnetBackbone', channel_list=(8, 8, 8, 8)),
        decode_head=dict(type='UnetHead', num_classes=2,
                         decoder_channel=(16, 8, 8, 8, 8), in_channels=8,
                         loss_decode=dict(type='CrossEntropyLoss')),
        test_cfg=dict(mode='whole'))
    img = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3),
                      jnp.float32)
    gt = jnp.asarray(np.random.RandomState(1).randint(0, 2, (2, 32, 32)))
    rng = jax.random.PRNGKey(0)

    losses = []
    for mesh in (None, default_data_mesh(jax.devices()[:1])):
        model = build_segmentor(dict(cfg))
        model.init_weights(seed=0, input_size=(32, 32))
        tx = optax.sgd(0.01)
        step = make_train_step(model, tx, mesh=mesh)
        state = TrainState.create(model.variables, tx)
        state, logs = step(state, img, gt, rng)
        losses.append(float(logs['loss']))
    assert abs(losses[0] - losses[1]) < 1e-6
