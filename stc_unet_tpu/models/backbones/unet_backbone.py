"""STC U-Net encoder backbone.

TPU-native rebuild of reference ``mmseg/models/backbones/unet_backbone.py:16``
(UnetBackbone / KernelSelectAttention / TransformerBlock / Down / DoubleConv).
NHWC throughout. The 'S' (selective kernel), 'T' (transformer) and 'C'
(coordinate attention, in the head) modules are the author's STC additions.

Performance notes (TPU): the three KSA branch convs run as independent
XLA convs that share the input (fused by XLA); attention at the x4/x5 scales
(4096/1024 tokens, width 512) uses a single fused QKV-style einsum chain that
maps onto the MXU.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..bricks import BatchNorm, Conv2d, Linear, max_pool2d
from ..builder import BACKBONES


class DoubleConv(nn.Module):
    """(conv3x3 → BN → ReLU) × 2 — reference ``unet_backbone.py:116``."""
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.out_ch, 3, padding=1, name='conv0')(x)
        x = BatchNorm(name='bn1')(x, train=train)
        x = nn.relu(x)
        x = Conv2d(self.out_ch, 3, padding=1, name='conv3')(x)
        x = BatchNorm(name='bn4')(x, train=train)
        x = nn.relu(x)
        return x


class Down(nn.Module):
    """MaxPool(2) + DoubleConv — reference ``unet_backbone.py:102``."""
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = max_pool2d(x, 2)
        return DoubleConv(self.out_ch, name='conv')(x, train=train)


class KernelSelectAttention(nn.Module):
    """SK-style multi-kernel attention — reference ``unet_backbone.py:55``.

    Parallel 3/5/7 convs (+BN+ReLU) → global-avg-pool → FC bottleneck
    (d = max(L, C/reduction)) → per-kernel FC → softmax over the kernel axis
    → weighted sum of branch outputs.
    """
    channel: int = 512
    kernels: Sequence[int] = (3, 5, 7)
    reduction: int = 16
    group: int = 1
    L: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channel
        d = max(self.L, c // self.reduction)
        conv_outs = []
        for i, k in enumerate(self.kernels):
            h = Conv2d(c, k, padding=k // 2, groups=self.group,
                       name=f'conv{i}')(x)
            h = BatchNorm(name=f'bn{i}')(h, train=train)
            conv_outs.append(nn.relu(h))
        # HBM-bandwidth form: never materialize the (k, N, H, W, C) stack
        # (3.2 GB at stage-1 slide shapes) nor the summed U map — the pooled
        # statistic of the sum is the sum of per-branch pooled means, and
        # the softmax-weighted branch sum is a per-branch fma chain XLA can
        # fuse into the conv epilogues. Same math as the stacked form.
        # f32 accumulate: a bf16-native (H, W) mean lowers to a ~10x-slower
        # reduction on TPU than the fused convert+reduce (measured 42 ms vs
        # 4.3 ms per GB-pass on v5e) — and is less accurate
        S = sum(jnp.mean(h.astype(jnp.float32), axis=(1, 2))
                for h in conv_outs)                            # (N, C)
        Z = Linear(d, name='fc')(S)                            # (N, d)
        weights = [Linear(c, name=f'fcs{i}')(Z)
                   for i in range(len(self.kernels))]
        att = nn.softmax(jnp.stack(weights, axis=0), axis=0)   # (k, N, C)
        out = 0.
        for i, h in enumerate(conv_outs):
            out = out + att[i][:, None, None, :].astype(h.dtype) * h
        return out


class MultiheadAttention(nn.Module):
    """torch ``nn.MultiheadAttention`` parameterization (batch of tokens).

    Stored as packed in_proj (3C, C) + out_proj, so torch checkpoints map
    key-for-key. Input (N, L, C).

    ``use_flash``: route the attention core through the pallas TPU
    flash-attention kernel — never materializes the (L, L) score matrix
    (536 MB per layer at 4096 tokens x batch 8 bf16), the dominant HBM
    cost of the STC transformer at the x4 scale. Numerics match the
    einsum path (same softmax scale); off by default so CPU tests and
    the einsum path stay the reference semantics.
    """
    embed_dim: int
    num_heads: int
    use_flash: bool = False

    @nn.compact
    def __call__(self, q, k, v, train: bool = False):
        c, h = self.embed_dim, self.num_heads
        hd = c // h
        in_w = self.param('in_proj_weight', nn.initializers.xavier_uniform(),
                          (3 * c, c), jnp.float32)
        in_b = self.param('in_proj_bias', nn.initializers.zeros, (3 * c,),
                          jnp.float32)
        # TRAIN ONLY: compute in the activation dtype (same policy as the
        # Linear brick: params stored f32, cast at use). Without this, bf16 @
        # f32 promotes to f32 and the promotion propagates through the
        # residual stream to EVERY later layer — measured as the whole
        # transformer stack running at the f32 MXU rate in the train step
        # (bwd 4.2x fwd; the bf16 attention core alone is bwd 0.45x fwd,
        # tools/probe_attention_bwd.py).
        # EVAL keeps f32 weights: in the compiled slide program the bf16 cast
        # flips XLA's whole-program layout assignment — the x1..x3 KSA
        # stages lose their fused (global-mean, convert) reduction and gain
        # ~55 ms/iter of pure {3,1,0,2}->{3,0,2,1} relayout fusions on the
        # 256^2x64 / 128^2x128 / 64^2x256 activations (trace-diffed on the
        # real chip: slide 49.9 -> 42.9 slices/s with the cast applied).
        if train:
            in_w = in_w.astype(q.dtype)
            in_b = in_b.astype(q.dtype)
        q = q @ in_w[:c].T + in_b[:c]
        k = k @ in_w[c:2 * c].T + in_b[c:2 * c]
        v = v @ in_w[2 * c:].T + in_b[2 * c:]
        n, lq = q.shape[0], q.shape[1]
        lk = k.shape[1]
        q = q.reshape(n, lq, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(n, lk, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(n, lk, h, hd).transpose(0, 2, 1, 3)
        if self.use_flash:
            import math

            from jax.experimental.pallas.ops.tpu.flash_attention import \
                flash_attention
            out = flash_attention(q.astype(jnp.float32),
                                  k.astype(jnp.float32),
                                  v.astype(jnp.float32),
                                  sm_scale=1.0 / math.sqrt(hd))
            out = out.astype(q.dtype)
        else:
            att = jnp.einsum('nhqd,nhkd->nhqk', q, k) / \
                jnp.sqrt(hd).astype(q.dtype)
            att = nn.softmax(att, axis=-1)
            out = jnp.einsum('nhqk,nhkd->nhqd', att, v)
        out = out.transpose(0, 2, 1, 3).reshape(n, lq, c)
        return Linear(c, name='out_proj')(out)


class TransformerLayer(nn.Module):
    """ViT layer without LayerNorm — reference ``unet_backbone.py:195``.

    Note the reference applies extra q/k/v Linears (bias-free) *before*
    nn.MultiheadAttention's own in_proj; replicated here for parity.
    """
    c: int
    num_heads: int
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = Linear(self.c, use_bias=False, name='q')(x)
        k = Linear(self.c, use_bias=False, name='k')(x)
        v = Linear(self.c, use_bias=False, name='v')(x)
        x = MultiheadAttention(self.c, self.num_heads,
                               use_flash=self.use_flash,
                               name='ma')(q, k, v, train=train) + x
        h = Linear(self.c, use_bias=False, name='fc1')(x)
        x = Linear(self.c, use_bias=False, name='fc2')(h) + x
        return x


class TransformerBlock(nn.Module):
    """Tokenize HW → pos-embed Linear → N transformer layers → un-tokenize.

    Reference ``unet_backbone.py:229-246``. c1 == c2 in the STC config so the
    channel-matching pre-conv is omitted (reference only adds it when
    c1 != c2).
    """
    c2: int
    num_heads: int
    num_layers: int
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        assert c == self.c2, 'channel-matching conv not needed in STC config'
        p = x.reshape(n, h * w, c)
        p = p + Linear(self.c2, name='linear')(p)
        for i in range(self.num_layers):
            p = TransformerLayer(self.c2, self.num_heads,
                                 use_flash=self.use_flash,
                                 name=f'tr{i}')(p, train=train)
        return p.reshape(n, h, w, self.c2)


@BACKBONES.register_module()
class UnetBackbone(nn.Module):
    """5-scale U-Net encoder — reference ``unet_backbone.py:16``.

    channels [c0, c1, c2, c3, c3]; optional KSA residuals on x1..x3 and
    transformer residuals at x4/x5.
    """
    in_channels: int = 3
    channel_list: Sequence[int] = (64, 128, 256, 512)
    context_layer: Optional[str] = None
    coord_att: bool = False
    transformer_block: bool = False
    flash_attention: bool = False
    init_cfg: Optional[dict] = None
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cl = list(self.channel_list)
        x1 = DoubleConv(cl[0], name='inc')(x, train=train)
        x2 = Down(cl[1], name='down1')(x1, train=train)
        x3 = Down(cl[2], name='down2')(x2, train=train)
        x4 = Down(cl[3], name='down3')(x3, train=train)
        x5 = Down(cl[3], name='down4')(x4, train=train)
        if self.context_layer == 'kernelselect':
            x1 = x1 + KernelSelectAttention(cl[0], name='context_layer1_1')(
                x1, train=train)
            x2 = x2 + KernelSelectAttention(cl[1], name='context_layer2_1')(
                x2, train=train)
            x3 = x3 + KernelSelectAttention(cl[2], name='context_layer3_1')(
                x3, train=train)
        if self.transformer_block:
            x4 = TransformerBlock(cl[3], 2, 4,
                                  use_flash=self.flash_attention,
                                  name='aspp4')(x4, train=train) + x4
            x5 = TransformerBlock(cl[3], 2, 4,
                                  use_flash=self.flash_attention,
                                  name='aspp5')(x5, train=train) + x5
        return [x1, x2, x3, x4, x5]
