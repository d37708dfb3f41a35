"""HRNet / MobileNetV3 / ResNeXt / ResNeSt backbone tests."""
import jax
import numpy as np

from stc_unet_tpu.models import build_backbone


def _forward(cfg, shape=(1, 32, 32, 3)):
    bb = build_backbone(cfg)
    x = np.random.RandomState(0).rand(*shape).astype(np.float32)
    variables = bb.init({'params': jax.random.PRNGKey(0),
                         'dropout': jax.random.PRNGKey(1)}, x)
    return bb.apply(variables, x)


def test_hrnet_w18_tiny():
    extra = dict(
        stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                    num_blocks=(1,), num_channels=(4,)),
        stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                    num_blocks=(1, 1), num_channels=(4, 8)),
        stage3=dict(num_modules=1, num_branches=3, block='BASIC',
                    num_blocks=(1, 1, 1), num_channels=(4, 8, 16)),
        stage4=dict(num_modules=1, num_branches=4, block='BASIC',
                    num_blocks=(1, 1, 1, 1), num_channels=(4, 8, 16, 32)))
    outs = _forward(dict(type='HRNet', extra=extra), (1, 64, 64, 3))
    assert len(outs) == 4
    assert [o.shape for o in outs] == [
        (1, 16, 16, 4), (1, 8, 8, 8), (1, 4, 4, 16), (1, 2, 2, 32)]


def test_mobilenet_v3_small():
    outs = _forward(dict(type='MobileNetV3', arch='small',
                         out_indices=(0, 1, 12)), (1, 64, 64, 3))
    assert len(outs) == 3
    assert outs[0].shape[-1] == 16
    assert outs[-1].shape[-1] == 576


def test_resnext():
    outs = _forward(dict(type='ResNeXt', depth=50, groups=4, base_width=4,
                         base_channels=4, stem_channels=4,
                         out_indices=(3,)), (1, 32, 32, 3))
    assert outs[0].shape == (1, 1, 1, 128)


def test_resnest():
    outs = _forward(dict(type='ResNeSt', depth=50, radix=2, groups=1,
                         base_width=4, base_channels=4, stem_channels=4,
                         out_indices=(3,)), (1, 32, 32, 3))
    assert outs[0].shape == (1, 1, 1, 128)
