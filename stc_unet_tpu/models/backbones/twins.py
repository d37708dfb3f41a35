"""Twins backbones: PCPVT and SVT (≙ reference ``backbones/twins.py``, 588).

PCPVT: pyramid ViT with spatial-reduction attention + conditional position
encoding (depthwise-conv PEG after the first block of each stage).
SVT: alternates locally-grouped (windowed) attention with global
sub-sampled attention.

All LayerNorms use eps 1e-5: the reference builds them from
``norm_cfg=dict(type='LN')`` (twins.py:471,475) → torch default.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..bricks import Conv2d
from ..builder import BACKBONES
from ..utils.swin_core import DropPath
from .mit import EfficientMHA, MiTBlock

_EPS = 1e-5


class PEG(nn.Module):
    """Positional encoding generator: 3x3 depthwise conv residual."""
    dim: int

    @nn.compact
    def __call__(self, x, hw):
        b, n, c = x.shape
        h, w = hw
        feat = x.reshape(b, h, w, c)
        feat = Conv2d(self.dim, 3, padding=1, groups=self.dim,
                      name='proj')(feat)
        return x + feat.reshape(b, n, c)


def _lsa_pad_mask(hp: int, wp: int, ws: int, pad_h: int,
                  pad_w: int) -> Optional[np.ndarray]:
    """LSA pad mask (reference twins.py:205-230). The reference fills
    ``mask[:, -pad_b:, :]`` then ``mask[:, :, -pad_r:]``: a zero pad on
    either axis makes ``[-0:]`` select EVERYTHING, so the mask collapses to
    all-ones (a no-op) unless BOTH pads are positive — replicated."""
    if pad_h <= 0 or pad_w <= 0:
        return None
    m = np.zeros((hp, wp), np.float32)
    m[-pad_h:, :] = 1.0
    m[:, -pad_w:] = 1.0
    mw = m.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    mw = mw.reshape(-1, ws * ws)
    am = mw[:, None, :] - mw[:, :, None]
    return np.where(am != 0, -1000.0, 0.0).astype(np.float32)


class LSA(nn.Module):
    """Locally-grouped self-attention (SVT): windowed MHA with the
    reference's pad mask (reference ``twins.py:148-244``)."""
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x, hw, train: bool = False):
        b, n, c = x.shape
        h, w = hw
        ws = self.window_size
        hd = c // self.num_heads
        pad_h = (ws - h % ws) % ws
        pad_w = (ws - w % ws) % ws
        feat = x.reshape(b, h, w, c)
        if pad_h or pad_w:
            feat = jnp.pad(feat, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w
        nw = (hp // ws) * (wp // ws)
        feat = feat.reshape(b, hp // ws, ws, wp // ws, ws, c)
        feat = feat.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=x.dtype,
                       name='qkv')(feat)
        qkv = qkv.reshape(-1, ws * ws, 3, self.num_heads, hd)
        qkv = qkv.transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum('bhnd,bhmd->bhnm', q, k) * hd ** -0.5
        mask = _lsa_pad_mask(hp, wp, ws, pad_h, pad_w)
        if mask is not None:
            attn = attn.reshape(b, nw, self.num_heads, ws * ws, ws * ws)
            attn = attn + jnp.asarray(mask, attn.dtype)[None, :, None]
            attn = attn.reshape(-1, self.num_heads, ws * ws, ws * ws)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum('bhnm,bhmd->bhnd', attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(-1, ws * ws, c)
        out = nn.Dense(c, dtype=x.dtype, name='proj')(out)
        out = out.reshape(b, hp // ws, wp // ws, ws, ws, c)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        if pad_h or pad_w:
            out = out[:, :h, :w]
        return out.reshape(b, n, c)


class SVTBlock(nn.Module):
    """One SVT block: LSA or GSA (sub-sampled EfficientMHA) + MLP."""
    dim: int
    num_heads: int
    window_size: int
    sr_ratio: int
    use_lsa: bool
    mlp_ratio: float
    drop_path: float
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x, hw, train: bool = False):
        a = nn.LayerNorm(epsilon=_EPS, name='norm1', dtype=x.dtype)(x)
        if self.use_lsa:
            a = LSA(self.dim, self.num_heads, self.window_size,
                    qkv_bias=self.qkv_bias, name='attn')(a, hw, train=train)
        else:
            a = EfficientMHA(self.dim, self.num_heads, self.sr_ratio,
                             qkv_bias=self.qkv_bias, ln_eps=_EPS,
                             name='attn')(a, hw, train=train)
        x = x + DropPath(self.drop_path, name='dp1')(a, train=train)
        m = nn.LayerNorm(epsilon=_EPS, name='norm2', dtype=x.dtype)(x)
        m = nn.Dense(int(self.dim * self.mlp_ratio), dtype=x.dtype,
                     name='fc1')(m)
        m = nn.gelu(m, approximate=False)
        m = nn.Dense(self.dim, dtype=x.dtype, name='fc2')(m)
        return x + DropPath(self.drop_path, name='dp2')(m, train=train)


class _TwinsBase(nn.Module):
    in_channels: int = 3
    embed_dims: Sequence[int] = (64, 128, 256, 512)
    patch_sizes: Sequence[int] = (4, 2, 2, 2)
    strides: Sequence[int] = (4, 2, 2, 2)
    num_heads: Sequence[int] = (1, 2, 4, 8)
    mlp_ratios: Sequence[int] = (4, 4, 4, 4)
    depths: Sequence[int] = (3, 4, 6, 3)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    windiow_sizes: Sequence[int] = (7, 7, 7, 7)  # reference's spelling
    out_indices: Sequence[int] = (0, 1, 2, 3)
    qkv_bias: bool = False  # reference PCPVT/SVT ctor default
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    norm_after_stage: bool = False
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None

    def __post_init__(self):
        from ..utils import check_pretrained_init_cfg
        check_pretrained_init_cfg(self.pretrained, self.init_cfg)
        super().__post_init__()


    svt: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dpr = list(np.linspace(0, self.drop_path_rate, sum(self.depths)))
        cur = 0
        outs = []
        for i in range(len(self.depths)):
            dim = self.embed_dims[i]
            k, s = self.patch_sizes[i], self.strides[i]
            if k == s:
                # mmcv PatchEmbed AdaptivePadding 'corner': pad bottom/right
                # to a stride multiple (reference twins.py:421-429)
                ph = (s - x.shape[1] % s) % s
                pw = (s - x.shape[2] % s) % s
                if ph or pw:
                    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
                pad = 0
            else:
                pad = k // 2
            x = Conv2d(dim, k, s, padding=pad,
                       name=f'patch_embed{i}_proj')(x)
            b, h, w, _ = x.shape
            tokens = x.reshape(b, h * w, dim)
            tokens = nn.LayerNorm(epsilon=_EPS, name=f'patch_embed{i}_norm',
                                  dtype=x.dtype)(tokens)
            tokens = nn.Dropout(self.drop_rate,
                                deterministic=not train)(tokens)
            for j in range(self.depths[i]):
                if self.svt:
                    tokens = SVTBlock(
                        dim, self.num_heads[i], self.windiow_sizes[i],
                        self.sr_ratios[i], use_lsa=(j % 2 == 0),
                        mlp_ratio=self.mlp_ratios[i],
                        drop_path=dpr[cur + j], qkv_bias=self.qkv_bias,
                        name=f'block{i}_{j}')(tokens, (h, w), train=train)
                else:
                    tokens = MiTBlock(
                        dim, self.num_heads[i], self.sr_ratios[i],
                        float(self.mlp_ratios[i]), self.drop_rate,
                        self.attn_drop_rate, dpr[cur + j], self.qkv_bias,
                        ln_eps=_EPS,
                        name=f'block{i}_{j}')(tokens, (h, w), train=train)
                if j == 0:
                    tokens = PEG(dim, name=f'peg{i}')(tokens, (h, w))
            cur += self.depths[i]
            if self.norm_after_stage:
                tokens = nn.LayerNorm(epsilon=_EPS, name=f'norm{i}',
                                      dtype=x.dtype)(tokens)
            x = tokens.reshape(b, h, w, dim)
            if i in self.out_indices:
                outs.append(x)
        return outs


@BACKBONES.register_module()
class PCPVT(_TwinsBase):
    """Twins-PCPVT (conditional position encoding PVT)."""
    svt: bool = False


@BACKBONES.register_module()
class SVT(_TwinsBase):
    """Twins-SVT (locally-grouped + global sub-sampled attention)."""
    svt: bool = True
    depths: Sequence[int] = (2, 2, 10, 4)
    embed_dims: Sequence[int] = (64, 128, 256, 512)
    num_heads: Sequence[int] = (2, 4, 8, 16)
    norm_after_stage: bool = True  # reference SVT ctor default
