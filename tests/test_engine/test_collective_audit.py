"""HLO communication audit of the sharded programs (VERDICT r2 item 5).

Compiles the 8-way programs and inventories their collective ops from the
optimized HLO text: the data-parallel train step may communicate ONLY via
all-reduce (grad/BN-stat/log-var psum — the DDP-equivalent collectives,
SURVEY.md §2.9); an accidental all-gather of activations would be invisible
at toy runtimes yet catastrophic at 512² — this test makes it a failure.
The 2-D data×spatial whole-inference program may additionally use
collective-permute (the conv halo exchanges GSPMD inserts).
"""
import re

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from stc_unet_tpu.core import build_optimizer_tx
from stc_unet_tpu.engine import TrainState, default_data_mesh, make_train_step
from stc_unet_tpu.models import build_segmentor

TINY = dict(
    type='EncoderDecoder',
    backbone=dict(type='UnetBackbone', in_channels=3,
                  context_layer='kernelselect', transformer_block=True,
                  channel_list=[4, 8, 8, 8]),
    decode_head=dict(type='UnetHead', se=True, num_classes=2, channels=4,
                     decoder_channel=[16, 16, 16, 16, 4],
                     loss_decode=[
                         dict(type='CrossEntropyLoss', use_sigmoid=False,
                              loss_name='loss_bce', loss_weight=1.0),
                         dict(type='DiceLoss', loss_name='loss_dice',
                              loss_weight=1.0)]),
    test_cfg=dict(mode='whole'))

_COLLECTIVES = ('all-reduce', 'all-gather', 'reduce-scatter',
                'collective-permute', 'all-to-all', 'collective-broadcast')


def _collective_inventory(hlo_text: str):
    """{op_kind: [result_shapes]} for every collective in optimized HLO."""
    inv = {}
    # e.g.:  %all-reduce.1 = f32[4,8]{1,0} all-reduce(...)
    pat = re.compile(
        r'= ([a-z0-9]+\[[0-9,]*\])[^ ]* ({})(?:-start)?\('.format('|'.join(
            _COLLECTIVES)))
    for shape, kind in pat.findall(hlo_text):
        inv.setdefault(kind, []).append(shape)
    return inv


def _shape_elems(shape: str) -> int:
    dims = shape[shape.index('[') + 1:shape.index(']')]
    if not dims:
        return 1
    return int(np.prod([int(d) for d in dims.split(',')]))


def test_train_step_collectives_are_reductions_only():
    assert jax.device_count() >= 8
    mesh = default_data_mesh()
    model = build_segmentor(TINY)
    variables = model.init_weights(seed=0, input_size=(32, 32))
    tx = build_optimizer_tx(dict(type='Adam', lr=1e-4, betas=(0.9, 0.999)))
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, mesh=mesh, donate=False)
    img = np.zeros((16, 32, 32, 3), np.float32)
    gt = np.zeros((16, 32, 32), np.int32)
    hlo = step.lower(state, img, gt, jax.random.PRNGKey(0)) \
        .compile().as_text()
    inv = _collective_inventory(hlo)
    assert 'all-reduce' in inv, 'expected grad/BN psum all-reduces'
    forbidden = {k: v for k, v in inv.items()
                 if k in ('all-to-all', 'collective-permute')}
    assert not forbidden, f'unexpected collectives in DP step: {forbidden}'
    # any gather/scatter present must be small bookkeeping (SPMD sometimes
    # lowers a replicated reduction that way), never activation-sized:
    # batch activations at 32² start at 16*32*32*4 = 65k elements
    for kind in ('all-gather', 'reduce-scatter'):
        for shape in inv.get(kind, []):
            assert _shape_elems(shape) < 16 * 32 * 32, \
                f'{kind} of activation-sized {shape} in the DP train step'


def test_spatial_whole_inference_halo_is_permute_not_gather():
    """2-D data×spatial whole mode: halos must ride collective-permute;
    no all-gather of whole feature maps."""
    assert jax.device_count() >= 8
    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ('data', 'spatial'))
    model = build_segmentor(TINY)
    model.init_weights(seed=0, input_size=(32, 32))
    model.variables = jax.tree_util.tree_map(np.asarray, model.variables)
    model.set_mesh(mesh)
    fn = model._jit_encode_decode()
    img = np.zeros((2, 32, 32, 3), np.float32)
    hlo = fn.lower(model.variables, img).compile().as_text()
    inv = _collective_inventory(hlo)
    assert 'collective-permute' in inv, \
        'expected GSPMD halo exchanges on the spatial axis'
    # full 32² activation on one device would be ≥ 2*32*32 elements after
    # gathering the sharded H axis; allow small edge/halo gathers only
    for shape in inv.get('all-gather', []):
        assert _shape_elems(shape) <= 2 * 32 * 32, \
            f'whole-activation all-gather {shape} in spatial inference'
