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
                               fusion_type=self.bottleneck_type,
                               norm_cfg=norm_cfg, act_cfg=act_cfg,
                               name=f'stage{i}_{j}')(x, train=train)
            outs.append(x)
        if self.with_final_conv:
            # reference stdc.py:294-300 — 1x1 widen of the LAST output only
            outs[-1] = ConvModule(max(1024, ch[-1]), 1, norm_cfg=norm_cfg,
                                  act_cfg=act_cfg,
                                  name='final_conv')(outs[-1], train=train)
        return outs


class FeatureFusionModule(nn.Module):
    """STDC FFM (reference ``stdc.py:131-184``): 1x1 fuse conv, then a
    TWO-conv squeeze/excite attention (inter width = out // scale_factor,
    both convs bias-free, norm-free), output = x*attn + x."""
    out_channels: int
    scale_factor: int = 4
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, spatial, context, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        inputs = jnp.concatenate([spatial, context], axis=-1)
        x = ConvModule(self.out_channels, 1, norm_cfg=norm_cfg,
                       act_cfg=act_cfg, name='conv0')(inputs, train=train)
        att = jnp.mean(x, axis=(1, 2), keepdims=True)
        att = ConvModule(self.out_channels // self.scale_factor, 1,
                         bias=False, act_cfg=act_cfg,
                         name='att0')(att, train=train)
        att = ConvModule(self.out_channels, 1, bias=False, act_cfg=None,
                         name='att1')(att, train=train)
        att = nn.sigmoid(att)
        return x * att + x


@BACKBONES.register_module()
class STDCContextPathNet(nn.Module):
    """STDC + BiSeNet-style context path + FFM (reference ``stdc.py:328-422``).

    Returns ``(outs[0], arms_out[0], arms_out[1], feat_fuse)`` — the order
    the stock configs' ``in_index`` values address (detail head at 0,
    aux FCN heads at 1/2, decode head at 3).
    """
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
        from .bisenet import AttentionRefinement
        norm_cfg = self.norm_cfg or dict(type='BN')
        backbone = REG.build(dict(self.backbone_cfg))
        outs = list(backbone(x, train=train))
        # global context: GAP → 1x1 conv (default ReLU), broadcast up
        avg = jnp.mean(outs[-1], axis=(1, 2), keepdims=True)
        avg_feat = ConvModule(self.out_channels, 1, norm_cfg=norm_cfg,
                              act_cfg=dict(type='ReLU'),
                              name='conv_avg')(avg, train=train)
        feature_up = resize(avg_feat, size=outs[-1].shape[1:3],
                            mode=self.upsample_mode,
                            align_corners=self.align_corners, warning=False)
        arms_out = []
        for i in range(len(self.last_in_channels)):
            # ARM(outs[-1-i]) + context, THEN upsample to the next-shallower
            # stage and refine with a 3x3 conv (reference order: resize
            # BEFORE the refine conv — stdc.py:404-413)
            x_arm = AttentionRefinement(
                self.out_channels, norm_cfg=norm_cfg,
                name=f'arm{i}')(outs[-1 - i], train=train) + feature_up
            feature_up = resize(x_arm, size=outs[-2 - i].shape[1:3],
                                mode=self.upsample_mode,
                                align_corners=self.align_corners,
                                warning=False)
            feature_up = ConvModule(self.out_channels, 3, padding=1,
                                    norm_cfg=norm_cfg,
                                    act_cfg=dict(type='ReLU'),
                                    name=f'conv{i}')(feature_up, train=train)
            arms_out.append(feature_up)
        ffm_cfg = dict(self.ffm_cfg or dict(in_channels=512,
                                            out_channels=256,
                                            scale_factor=4))
        feat_fuse = FeatureFusionModule(
            out_channels=ffm_cfg['out_channels'],
            scale_factor=ffm_cfg.get('scale_factor', 4),
            name='ffm')(outs[0], arms_out[1], train=train)
        return tuple([outs[0]] + arms_out + [feat_fuse])
