"""FastSCNN/STDC/BiSeNet/CGNet/ERFNet/ICNet(+ICNeck) backbone tests."""
import jax
import numpy as np

from stc_unet_tpu.models import build_backbone, build_neck


def _forward(cfg, shape=(1, 64, 64, 3)):
    bb = build_backbone(cfg)
    x = np.random.RandomState(0).rand(*shape).astype(np.float32)
    variables = bb.init({'params': jax.random.PRNGKey(0),
                         'dropout': jax.random.PRNGKey(1)}, x)
    return bb.apply(variables, x)


def test_fast_scnn():
    outs = _forward(dict(type='FastSCNN', downsample_dw_channels=(4, 6),
                         global_in_channels=8,
                         global_block_channels=(8, 12, 16),
                         global_out_channels=16, higher_in_channels=8,
                         lower_in_channels=16, fusion_out_channels=16))
    assert len(outs) == 3
    assert outs[0].shape == (1, 8, 8, 8)      # 1/8
    assert outs[1].shape == (1, 2, 2, 16)     # 1/32
    assert outs[2].shape == (1, 8, 8, 16)     # fused


def test_stdc_context_path():
    outs = _forward(dict(
        type='STDCContextPathNet',
        backbone_cfg=dict(type='STDCNet', stdc_type='STDCNet1',
                          channels=(4, 8, 16, 32, 64),
                          norm_cfg=dict(type='BN')),
        last_in_channels=(64, 32), out_channels=8,
        ffm_cfg=dict(in_channels=24, out_channels=16, scale_factor=4)))
    assert len(outs) == 4
    # reference order (stdc.py:417-422): detail map, two ARM refinements
    # (1/16 then 1/8 spatial), FFM fusion last
    assert outs[0].shape == (1, 8, 8, 16)    # backbone 1/8 (detail head)
    assert outs[1].shape == (1, 4, 4, 8)     # arm refine at 1/16
    assert outs[2].shape == (1, 8, 8, 8)     # arm refine at 1/8
    assert outs[3].shape == (1, 8, 8, 16)    # ffm fusion (decode head)


def test_bisenetv1():
    outs = _forward(dict(
        type='BiSeNetV1',
        backbone_cfg=dict(type='ResNet', depth=18, base_channels=4,
                          stem_channels=4),
        spatial_channels=(4, 4, 4, 8), context_channels=(8, 16, 32),
        out_channels=16))
    assert len(outs) == 3
    assert outs[0].shape == (1, 8, 8, 16)


def test_bisenetv2():
    outs = _forward(dict(type='BiSeNetV2', detail_channels=(4, 4, 8),
                         semantic_channels=(2, 4, 8, 8), bga_channels=8))
    assert len(outs) == 5
    assert outs[0].shape == (1, 8, 8, 8)


def test_cgnet():
    outs = _forward(dict(type='CGNet', num_channels=(4, 8, 16),
                         num_blocks=(2, 2)))
    assert len(outs) == 3


def test_erfnet():
    outs = _forward(dict(type='ERFNet',
                         enc_downsample_channels=(4, 8, 16),
                         enc_stage_non_bottlenecks=(2, 2),
                         enc_non_bottleneck_dilations=(2, 4),
                         enc_non_bottleneck_channels=(8, 16),
                         dec_upsample_channels=(8, 4),
                         dec_stages_non_bottleneck=(1, 1),
                         dec_non_bottleneck_channels=(8, 4)))
    assert outs[0].shape == (1, 32, 32, 4)


def test_icnet_with_neck():
    outs = _forward(dict(
        type='ICNet',
        backbone_cfg=dict(type='ResNet', depth=18, base_channels=4,
                          stem_channels=4),
        light_branch_middle_channels=4, psp_out_channels=16,
        out_channels=(4, 8, 8), layer_channels=(8, 32)))
    assert len(outs) == 3
    neck = build_neck(dict(type='ICNeck', in_channels=(4, 8, 8),
                           out_channels=8))
    v = neck.init(jax.random.PRNGKey(0), outs)
    fused = neck.apply(v, outs)
    assert len(fused) == 3
