"""STDC backbone + context path (≙ reference ``backbones/stdc.py``, 422 LoC).

Short-term dense concatenate blocks; ``STDCContextPathNet`` wraps the net
with a BiSeNet-style context path + FFM as the reference does.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import ConvModule, avg_pool2d
from ..builder import BACKBONES


class STDCModule(nn.Module):
    """Dense-concat module (reference ``stdc.py:14-128``): a 1x1 conv then
    chained 3x3 convs with halving widths, fused by 'add' (residual skip)
    or 'cat' (avg-pool skip replaces the first feature when strided)."""
    out_channels: int
    stride: int = 1
    num_convs: int = 4
    fusion_type: str = 'add'
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None

    def __post_init__(self):
        assert self.num_convs > 1
        assert self.fusion_type in ('add', 'cat')
        super().__post_init__()

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = self.out_channels
        downsample = self.stride == 2
        # conv_0 omits act_cfg in the reference (stdc.py:46-47) → mmcv's
        # default ReLU, NOT the module's act_cfg
        x0 = ConvModule(oc // 2, 1, norm_cfg=self.norm_cfg,
                        act_cfg=dict(type='ReLU'),
                        name='conv0')(x, train=train)

        def chain(h, start):
            feats = []
            for i in range(start, self.num_convs):
                last = i == self.num_convs - 1
                ch = oc // (2 ** i) if last else oc // (2 ** (i + 1))
                h = ConvModule(ch, 3, padding=1, norm_cfg=self.norm_cfg,
                               act_cfg=self.act_cfg,
                               name=f'conv{i}')(h, train=train)
                feats.append(h)
            return feats

        if self.fusion_type == 'add':
            # layers[0] = conv0 (+ dw downsample when strided); skip maps
            # the INPUT via dw-s2 + 1x1 (both act-free); out = cat + skip
            h0 = x0
            if downsample:
                h0 = ConvModule(oc // 2, 3, stride=2, padding=1,
                                groups=oc // 2, norm_cfg=self.norm_cfg,
                                act_cfg=None, name='downsample')(x0,
                                                                 train=train)
                skip = ConvModule(x.shape[-1], 3, stride=2, padding=1,
                                  groups=x.shape[-1], norm_cfg=self.norm_cfg,
                                  act_cfg=None, name='skip0')(x, train=train)
                skip = ConvModule(oc, 1, norm_cfg=self.norm_cfg,
                                  act_cfg=None, name='skip1')(skip,
                                                              train=train)
            else:
                skip = x
            feats = [h0] + chain(h0, 1)
            return jnp.concatenate(feats, axis=-1) + skip
        # 'cat': conv1 runs on downsample(x0); the first concatenated
        # feature is the AVG-POOLED x0 (reference stdc.py:114-128)
        if downsample:
            h1_in = ConvModule(oc // 2, 3, stride=2, padding=1,
                               groups=oc // 2, norm_cfg=self.norm_cfg,
                               act_cfg=None, name='downsample')(x0,
                                                                train=train)
            first = avg_pool2d(x0, 3, 2, padding=1)
        else:
            h1_in = x0
            first = x0
        feats = [first] + chain(h1_in, 1)
        return jnp.concatenate(feats, axis=-1)


@BACKBONES.register_module()
class STDCNet(nn.Module):
    """STDC1/2 classification trunk for segmentation."""
    stdc_type: str = 'STDCNet1'
    in_channels: int = 3
    channels: Sequence[int] = (32, 64, 256, 512, 1024)
    bottleneck_type: str = 'cat'
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    num_convs: int = 4
    with_final_conv: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None

    arch = {'STDCNet1': [1, 1, 1], 'STDCNet2': [3, 4, 2]}

    def __post_init__(self):
        # constructor contract ≙ reference ``stdc.py`` STDCNet ctor
        # (tests/test_backbones/test_stdc.py:67-99)
        assert self.stdc_type in self.arch, \
            f'invalid stdc_type {self.stdc_type!r} for STDCNet'
        assert self.bottleneck_type in ('add', 'cat'), \
            f"bottleneck_type must be 'add' or 'cat', " \
            f'got {self.bottleneck_type!r}'
        assert len(self.channels) == 5, \
            f'invalid channels length {len(self.channels)} (expected 5)'
        super().__post_init__()

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        ch = self.channels
        x = ConvModule(ch[0], 3, 2, padding=1, norm_cfg=norm_cfg,
                       act_cfg=act_cfg, name='stem0')(x, train=train)
        x = ConvModule(ch[1], 3, 2, padding=1, norm_cfg=norm_cfg,
                       act_cfg=act_cfg, name='stem1')(x, train=train)
        outs = []
        repeats = self.arch[self.stdc_type]
        for i, rep in enumerate(repeats):
            for j in range(rep + 1):
                x = STDCModule(ch[i + 2], stride=2 if j == 0 else 1,
                               num_convs=self.num_convs,
                               norm_cfg=norm_cfg, act_cfg=act_cfg,
                               name=f'stage{i}_{j}')(x, train=train)
            outs.append(x)
        return outs


@BACKBONES.register_module()
class STDCContextPathNet(nn.Module):
    """STDC + global context path + feature fusion (the seg wrapper)."""
    backbone_cfg: dict = None
    last_in_channels: Sequence[int] = (1024, 512)
    out_channels: int = 128
    ffm_cfg: Optional[dict] = None
    upsample_mode: str = 'nearest'
    align_corners: Optional[bool] = None
    norm_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..builder import BACKBONES as REG
        norm_cfg = self.norm_cfg or dict(type='BN')
        backbone = REG.build(dict(self.backbone_cfg))
        outs = backbone(x, train=train)
        # global context on the deepest
        deep = outs[-1]
        gap = jnp.mean(deep, axis=(1, 2), keepdims=True)
        gap = ConvModule(self.out_channels, 1, norm_cfg=norm_cfg,
                         act_cfg=dict(type='ReLU'),
                         name='gap_conv')(gap, train=train)
        arms = []
        feat = gap
        for i, inp in enumerate([outs[-1], outs[-2]]):
            arm = ConvModule(self.out_channels, 1, norm_cfg=norm_cfg,
                             act_cfg=None, name=f'arm_{i}')(inp, train=train)
            gate = jnp.mean(arm, axis=(1, 2), keepdims=True)
            gate = ConvModule(self.out_channels, 1, norm_cfg=norm_cfg,
                              act_cfg=dict(type='Sigmoid'),
                              name=f'arm_gate_{i}')(gate, train=train)
            arm = arm * gate
            feat = arm + resize(feat, size=arm.shape[1:3],
                                mode=self.upsample_mode,
                                align_corners=self.align_corners,
                                warning=False)
            feat = ConvModule(self.out_channels, 3, padding=1,
                              norm_cfg=norm_cfg, act_cfg=dict(type='ReLU'),
                              name=f'refine_{i}')(feat, train=train)
            arms.append(feat)
        # feature fusion with the 1/8 feature
        ffm_in = jnp.concatenate(
            [outs[0], resize(arms[-1], size=outs[0].shape[1:3],
                             mode=self.upsample_mode,
                             align_corners=self.align_corners,
                             warning=False)], axis=-1)
        ffm_cfg = self.ffm_cfg or dict(in_channels=512, out_channels=256,
                                       scale_factor=4)
        ffm = ConvModule(ffm_cfg['out_channels'], 1, norm_cfg=norm_cfg,
                         act_cfg=dict(type='ReLU'),
                         name='ffm_conv')(ffm_in, train=train)
        att = jnp.mean(ffm, axis=(1, 2), keepdims=True)
        att = ConvModule(ffm_cfg['out_channels'], 1,
                         act_cfg=dict(type='ReLU'),
                         name='ffm_att1')(att, train=train)
        att = ConvModule(ffm_cfg['out_channels'], 1,
                         act_cfg=dict(type='Sigmoid'),
                         name='ffm_att2')(att, train=train)
        ffm = ffm + ffm * att
        return [ffm] + arms + [outs[0]]
