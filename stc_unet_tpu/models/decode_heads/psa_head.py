"""PSAHead — point-wise spatial attention (≙ reference
``decode_heads/psa_head.py``, 197 LoC).

The reference needs mmcv's CUDA ``PSAMask`` ext, which scatters each
position's local (mask_h, mask_w) attention window into a global
(H*W, H, W) map (zero outside the window). Rebuilt here as one einsum
against two STATIC 0/1 selection tensors — a pair of batched MXU matmuls,
no gather/scatter:

    collect:    y[n, p, q] = m[n, ph-qh+half_h, pw-qw+half_w, qh, qw]
    distribute: y[n, k, q] = m[n, qh-kh+half_h, qw-kw+half_w, kh, kw]

(m = the conv's mask logits reshaped (n, hm, wm, h, w); p global source,
q target position, k owner position; out of mask range → 0, matching the
mmcv kernel — the zeros then PARTICIPATE in the dim-1 softmax.)
"""
from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from stc_unet_tpu.ops import resize
from ..bricks import Conv2d, ConvModule
from ..builder import HEADS
from .decode_head import BaseDecodeHead


@lru_cache(maxsize=None)
def _psamask_selector(mask_len: int, feat_len: int) -> np.ndarray:
    """A[i, p, q] = 1 iff i - half == p - q (one axis of the PSAMask
    placement; mmcv ``psamask.cpp`` collect/distribute share it)."""
    half = (mask_len - 1) // 2
    i = np.arange(mask_len)[:, None, None]
    p = np.arange(feat_len)[None, :, None]
    q = np.arange(feat_len)[None, None, :]
    return (i - half == p - q).astype(np.float32)


def psa_mask(mask, mask_size: Tuple[int, int], psa_type: str):
    """mmcv ``PSAMask`` forward. mask: (n, h, w, hm*wm) NHWC conv logits →
    (n, h*w, h*w) global attention, rows = softmax dim (source positions
    for 'collect', owner positions for 'distribute'), cols = flattened
    (h, w) spatial."""
    n, h, w, _ = mask.shape
    hm, wm = mask_size
    m = mask.reshape(n, h, w, hm, wm).transpose(0, 3, 4, 1, 2)
    a = jnp.asarray(_psamask_selector(hm, h), mask.dtype)
    b = jnp.asarray(_psamask_selector(wm, w), mask.dtype)
    if psa_type == 'collect':
        # y6[n, ph, pw, qh, qw] = m[n, ph-qh+half, pw-qw+half, qh, qw]
        y6 = jnp.einsum('nijab,ipa,jqb->npqab', m, a, b)
    else:
        # y6[n, kh, kw, qh, qw] = m[n, qh-kh+half, qw-kw+half, kh, kw]
        y6 = jnp.einsum('nijkl,iqk,jrl->nklqr', m, a, b)
    return y6.reshape(n, h * w, h * w)


@HEADS.register_module()
class PSAHead(BaseDecodeHead):
    """PSANet head: collect + distribute attention branches
    (reference ``psa_head.py:17-197``)."""
    mask_size: Tuple[int, int] = (97, 97)
    psa_type: str = 'bi-direction'
    compact: bool = False
    shrink_factor: int = 2
    normalization_factor: Optional[float] = 1.0
    psa_softmax: bool = True

    def __post_init__(self):
        # ≙ reference ``psa_head.py:47`` (ctor-time, test_psa_head.py:11-18)
        assert self.psa_type in ('collect', 'distribute', 'bi-direction'), \
            f'invalid psa_type {self.psa_type!r}'
        super().__post_init__()

    def _attention(self, feat, name, train):
        """reference ``self.attention``: ConvModule(1x1, norm+act) then a
        bias-free 1x1 conv to mask_h*mask_w logit channels."""
        hm, wm = self.mask_size
        y = ConvModule(self.channels, 1, norm_cfg=self.norm_cfg,
                       act_cfg=self.act_cfg,
                       name=f'{name}_0')(feat, train=train)
        return Conv2d(hm * wm, 1, use_bias=False, name=f'{name}_1')(y)

    def _shrink(self, feat, align_corners):
        """reference ``psa_head.py:121-134``: odd sizes round up with
        align_corners=True, even divide with align_corners=False."""
        if self.shrink_factor == 1:
            return feat, align_corners
        h, w = feat.shape[1:3]
        s = self.shrink_factor
        if h % s and w % s:
            h, w = (h - 1) // s + 1, (w - 1) // s + 1
            align_corners = True
        else:
            h, w = h // s, w // s
            align_corners = False
        feat = resize(feat, size=(h, w), mode='bilinear',
                      align_corners=align_corners, warning=False)
        return feat, align_corners

    def _apply(self, feat, y):
        """softmax over dim 1 then the reference bmm: out[q] = Σ_k feat[k]
        * y[k, q], normalized by 1/normalization_factor. ``y`` must be in
        the torch (n, k, q) layout — k the softmax/source dim, q the
        flattened output position."""
        n, h, w, c = feat.shape
        if self.psa_softmax:
            y = jax.nn.softmax(y, axis=1)
        norm = self.normalization_factor
        if norm is None:
            norm = float(self.mask_size[0] * self.mask_size[1])
        out = jnp.einsum('nkc,nkq->nqc', feat.reshape(n, h * w, c), y)
        return (out / norm).reshape(n, h, w, c)

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        identity = x
        in_ch = x.shape[-1]
        align_corners = self.align_corners
        if self.psa_type in ('collect', 'distribute'):
            out = ConvModule(self.channels, 1, norm_cfg=self.norm_cfg,
                             act_cfg=self.act_cfg,
                             name='reduce')(x, train=train)
            out, align_corners = self._shrink(out, align_corners)
            n, h, w, _ = out.shape
            y = self._attention(out, 'attention', train)
            if self.compact:
                # NHWC reshape gives (n, spatial, channel) — the TRANSPOSE
                # of torch's view(n, K, HW). Reference transposes only the
                # COLLECT compact map, so collect keeps the NHWC reshape
                # and distribute swaps back to torch's raw layout.
                y = y.reshape(n, h * w, h * w)
                if self.psa_type != 'collect':
                    y = jnp.swapaxes(y, 1, 2)
                out = self._apply(out, y)
            else:
                y = psa_mask(y, self.mask_size, self.psa_type)
                out = self._apply(out, y)
        else:  # bi-direction
            x_col = ConvModule(self.channels, 1, norm_cfg=self.norm_cfg,
                               act_cfg=self.act_cfg,
                               name='reduce')(x, train=train)
            x_dis = ConvModule(self.channels, 1, norm_cfg=self.norm_cfg,
                               act_cfg=self.act_cfg,
                               name='reduce_p')(x, train=train)
            x_col, align_corners = self._shrink(x_col, align_corners)
            x_dis, _ = self._shrink(x_dis, self.align_corners)
            n, h, w, _ = x_col.shape
            y_col = self._attention(x_col, 'attention', train)
            y_dis = self._attention(x_dis, 'attention_p', train)
            if self.compact:
                # reference transposes only y_dis; in NHWC that means
                # y_dis keeps the (spatial, channel) reshape and y_col
                # swaps to torch's raw (channel, spatial) layout
                y_col = jnp.swapaxes(y_col.reshape(n, h * w, h * w), 1, 2)
                y_dis = y_dis.reshape(n, h * w, h * w)
            else:
                y_col = psa_mask(y_col, self.mask_size, 'collect')
                y_dis = psa_mask(y_dis, self.mask_size, 'distribute')
            x_col = self._apply(x_col, y_col)
            x_dis = self._apply(x_dis, y_dis)
            out = jnp.concatenate([x_col, x_dis], axis=-1)
        # reference quirk: proj is a 1x1 ConvModule with padding=1 — output
        # grows by 2 px each side before the resize back (psa_head.py:99)
        out = ConvModule(in_ch, 1, padding=1, norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg, name='proj')(out, train=train)
        out = resize(out, size=identity.shape[1:3], mode='bilinear',
                     align_corners=align_corners, warning=False)
        out = ConvModule(self.channels, 3, padding=1,
                         norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                         name='bottleneck')(
            jnp.concatenate([identity, out], axis=-1), train=train)
        return self.cls_seg(out, train=train)
