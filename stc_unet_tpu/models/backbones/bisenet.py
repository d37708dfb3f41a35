"""BiSeNetV1 and BiSeNetV2 backbones
(≙ reference ``backbones/bisenetv1.py`` (332), ``bisenetv2.py`` (622))."""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import (ConvModule, DepthwiseSeparableConvModule,
                      adaptive_avg_pool2d, avg_pool2d, max_pool2d)
from ..builder import BACKBONES


class AttentionRefinement(nn.Module):
    out_channels: int
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvModule(self.out_channels, 3, padding=1,
                       norm_cfg=self.norm_cfg, act_cfg=dict(type='ReLU'),
                       name='conv')(x, train=train)
        att = jnp.mean(x, axis=(1, 2), keepdims=True)
        att = ConvModule(self.out_channels, 1, norm_cfg=self.norm_cfg,
                         act_cfg=dict(type='Sigmoid'),
                         name='att_conv')(att, train=train)
        return x * att


@BACKBONES.register_module()
class BiSeNetV1(nn.Module):
    """Spatial path + (backbone) context path + FFM."""
    backbone_cfg: dict = None
    in_channels: int = 3
    spatial_channels: Sequence[int] = (64, 64, 64, 128)
    context_channels: Sequence[int] = (128, 256, 512)
    out_indices: Sequence[int] = (0, 1, 2)
    align_corners: bool = False
    out_channels: int = 256
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None

    def __post_init__(self):
        # reference ``bisenetv1.py:308-313``
        assert len(self.spatial_channels) == 4, \
            (f'Length of spatial_channels should be 4, '
             f'got {len(self.spatial_channels)}')
        assert len(self.context_channels) == 3, \
            (f'Length of context_channels should be 3, '
             f'got {len(self.context_channels)}')
        super().__post_init__()

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..builder import BACKBONES as REG
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        # spatial path: 4 convs → 1/8
        sp = x
        for i, ch in enumerate(self.spatial_channels):
            k, s, p = (7, 2, 3) if i == 0 else (3, 2, 1)
            if i == 3:
                k, s, p = 1, 1, 0
            sp = ConvModule(ch, k, s, padding=p, norm_cfg=norm_cfg,
                            act_cfg=act_cfg,
                            name=f'spatial_{i}')(sp, train=train)
        # context path: backbone features at 1/16 and 1/32
        backbone = REG.build(dict(self.backbone_cfg))
        feats = backbone(x, train=train)
        c16, c32 = feats[-2], feats[-1]
        gap = jnp.mean(c32, axis=(1, 2), keepdims=True)
        gap = ConvModule(self.context_channels[0], 1, norm_cfg=norm_cfg,
                         act_cfg=act_cfg, name='gap_conv')(gap, train=train)
        c32 = AttentionRefinement(self.context_channels[0],
                                  norm_cfg=norm_cfg,
                                  name='arm32')(c32, train=train)
        c32 = c32 + gap
        c32 = resize(c32, size=c16.shape[1:3], mode='nearest',
                     align_corners=None, warning=False)
        c32 = ConvModule(self.context_channels[0], 3, padding=1,
                         norm_cfg=norm_cfg, act_cfg=act_cfg,
                         name='refine32')(c32, train=train)
        c16 = AttentionRefinement(self.context_channels[0],
                                  norm_cfg=norm_cfg,
                                  name='arm16')(c16, train=train)
        c16 = c16 + c32
        c16 = resize(c16, size=sp.shape[1:3], mode='nearest',
                     align_corners=None, warning=False)
        c16 = ConvModule(self.context_channels[0], 3, padding=1,
                         norm_cfg=norm_cfg, act_cfg=act_cfg,
                         name='refine16')(c16, train=train)
        # FFM
        cat = jnp.concatenate([sp, c16], axis=-1)
        fuse = ConvModule(self.out_channels, 1, norm_cfg=norm_cfg,
                          act_cfg=act_cfg, name='ffm_conv')(cat, train=train)
        # reference bisenetv1.py:241-261: ONE 1x1 ConvModule (bias=False,
        # norm + ReLU) then Sigmoid — not two norm-free convs
        att = jnp.mean(fuse, axis=(1, 2), keepdims=True)
        att = ConvModule(self.out_channels, 1, norm_cfg=norm_cfg,
                         act_cfg=act_cfg, name='ffm_att')(att, train=train)
        att = nn.sigmoid(att)
        fuse = fuse + fuse * att
        outs = [fuse, c16, c32]
        return [outs[i] for i in self.out_indices]


class DetailBranch(nn.Module):
    detail_channels: Sequence[int] = (64, 64, 128)
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, ch in enumerate(self.detail_channels):
            x = ConvModule(ch, 3, 2, padding=1, norm_cfg=self.norm_cfg,
                           act_cfg=dict(type='ReLU'),
                           name=f'stage{i}_0')(x, train=train)
            x = ConvModule(ch, 3, 1, padding=1, norm_cfg=self.norm_cfg,
                           act_cfg=dict(type='ReLU'),
                           name=f'stage{i}_1')(x, train=train)
        return x


class GELayer(nn.Module):
    """Gather-and-expansion layer (reference ``bisenetv2.py:180-302``):
    3x3 conv (act) → grouped expansion conv(s) → 1x1 projection (no act),
    residual (DW-separable shortcut when striding), final ReLU. The
    stride-2 variant has TWO grouped convs (s2 no-act, then s1 act)."""
    out_channels: int
    exp_ratio: int = 6
    stride: int = 1
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = in_ch * self.exp_ratio
        identity = x
        x = ConvModule(in_ch, 3, padding=1, norm_cfg=self.norm_cfg,
                       act_cfg=dict(type='ReLU'),
                       name='conv1')(x, train=train)
        if self.stride == 1:
            x = ConvModule(mid, 3, padding=1, groups=in_ch,
                           norm_cfg=self.norm_cfg,
                           act_cfg=dict(type='ReLU'),
                           name='dwconv')(x, train=train)
        else:
            x = ConvModule(mid, 3, stride=self.stride, padding=1,
                           groups=in_ch, norm_cfg=self.norm_cfg,
                           act_cfg=None, name='dwconv_0')(x, train=train)
            x = ConvModule(mid, 3, padding=1, groups=mid,
                           norm_cfg=self.norm_cfg,
                           act_cfg=dict(type='ReLU'),
                           name='dwconv_1')(x, train=train)
        x = ConvModule(self.out_channels, 1, norm_cfg=self.norm_cfg,
                       act_cfg=None, name='conv2')(x, train=train)
        if self.stride == 1:
            x = x + identity
        else:
            sc = DepthwiseSeparableConvModule(
                self.out_channels, 3, stride=self.stride, padding=1,
                dw_norm_cfg=self.norm_cfg, dw_act_cfg=None,
                pw_norm_cfg=self.norm_cfg, pw_act_cfg=None,
                name='shortcut')(identity, train=train)
            x = x + sc
        return nn.relu(x)


class SemanticBranch(nn.Module):
    """Reference ``bisenetv2.py:371-430``: stem + GE stages (the LAST
    stage has FOUR GE layers) + a SEPARATE context-embedding output —
    returns [stem, s2, ..., sN, ce] (the pre-CE deepest feature stays an
    aux-head input; only the BGA consumes the CE output)."""
    semantic_channels: Sequence[int] = (16, 32, 64, 128)
    exp_ratio: int = 6
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        # stem (reference StemBlock)
        c = self.semantic_channels[0]
        x = ConvModule(c, 3, 2, padding=1, norm_cfg=self.norm_cfg,
                       act_cfg=dict(type='ReLU'),
                       name='stem_conv')(x, train=train)
        left = ConvModule(c // 2, 1, norm_cfg=self.norm_cfg,
                          act_cfg=dict(type='ReLU'),
                          name='stem_left1')(x, train=train)
        left = ConvModule(c, 3, 2, padding=1, norm_cfg=self.norm_cfg,
                          act_cfg=dict(type='ReLU'),
                          name='stem_left2')(left, train=train)
        right = max_pool2d(x, 3, 2, padding=1)
        x = ConvModule(c, 3, padding=1, norm_cfg=self.norm_cfg,
                       act_cfg=dict(type='ReLU'), name='stem_fuse')(
            jnp.concatenate([left, right], axis=-1), train=train)
        outs.append(x)
        n = len(self.semantic_channels)
        for i in range(1, n):
            ch = self.semantic_channels[i]
            depth = 4 if i == n - 1 else 2
            for j in range(depth):
                x = GELayer(ch, self.exp_ratio, stride=2 if j == 0 else 1,
                            norm_cfg=self.norm_cfg,
                            name=f'ge{i}_{j}')(x, train=train)
            outs.append(x)
        # context embedding (reference CEBlock) — a SEPARATE output
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        from ..bricks import BatchNorm
        gap = BatchNorm(name='ce_bn')(gap, train=train)
        gap = ConvModule(self.semantic_channels[-1], 1,
                         norm_cfg=self.norm_cfg, act_cfg=dict(type='ReLU'),
                         name='ce_conv')(gap, train=train)
        ce = x + gap
        ce = ConvModule(self.semantic_channels[-1], 3, padding=1,
                        norm_cfg=self.norm_cfg, act_cfg=dict(type='ReLU'),
                        name='ce_out')(ce, train=train)
        outs.append(ce)
        return outs


@BACKBONES.register_module()
class BiSeNetV2(nn.Module):
    """Detail + semantic branches with guided aggregation."""
    in_channels: int = 3
    detail_channels: Sequence[int] = (64, 64, 128)
    semantic_channels: Sequence[int] = (16, 32, 64, 128)
    semantic_expansion_ratio: int = 6
    bga_channels: int = 128
    out_indices: Sequence[int] = (0, 1, 2, 3, 4)
    align_corners: bool = False
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        detail = DetailBranch(tuple(self.detail_channels), norm_cfg,
                              name='detail')(x, train=train)
        sem_outs = SemanticBranch(
            tuple(self.semantic_channels), self.semantic_expansion_ratio,
            norm_cfg, name='semantic')(x, train=train)
        sem = sem_outs[-1]  # the CE output feeds ONLY the BGA
        # bilateral guided aggregation
        c = self.bga_channels
        d_a = ConvModule(c, 3, padding=1, groups=detail.shape[-1],
                         norm_cfg=norm_cfg, act_cfg=None,
                         name='bga_d_dw')(detail, train=train)
        d_a = ConvModule(c, 1, act_cfg=None, name='bga_d_pw')(d_a,
                                                              train=train)
        d_b = ConvModule(c, 3, stride=2, padding=1, norm_cfg=norm_cfg,
                         act_cfg=None, name='bga_d_down')(detail,
                                                          train=train)
        d_b = avg_pool2d(d_b, 3, 2, padding=1)
        s_a = ConvModule(c, 3, padding=1, groups=sem.shape[-1],
                         norm_cfg=norm_cfg, act_cfg=None,
                         name='bga_s_dw')(sem, train=train)
        s_a = ConvModule(c, 1, act_cfg=dict(type='Sigmoid'),
                         name='bga_s_pw')(s_a, train=train)
        s_b = ConvModule(c, 3, padding=1, norm_cfg=norm_cfg, act_cfg=None,
                         name='bga_s_conv')(sem, train=train)
        s_b = resize(s_b, size=detail.shape[1:3], mode='bilinear',
                     align_corners=self.align_corners, warning=False)
        s_b = nn.sigmoid(s_b)
        left = d_a * s_b
        right = d_b * s_a
        right = resize(right, size=detail.shape[1:3], mode='bilinear',
                       align_corners=self.align_corners, warning=False)
        # reference bisenetv2.py:511-521: the BGA output ConvModule keeps
        # the default ReLU (an act_cfg=None here was caught by the oracle)
        fuse = ConvModule(c, 3, padding=1, norm_cfg=norm_cfg,
                          act_cfg=self.act_cfg or dict(type='ReLU'),
                          name='bga_out')(left + right, train=train)
        # reference bisenetv2.py:615-622: heads see [bga, stem, s2, s3,
        # s4] — the pre-CE deepest stage, NOT the CE output
        outs = [fuse] + sem_outs[:-1]
        return [outs[i] for i in self.out_indices]
