"""PointHead — PointRend refinement (≙ reference ``decode_heads/point_head.py``,
364 LoC).

TPU-native shape discipline: train-time point sampling uses a fixed point
count (oversample + top-k uncertainty + random fill) so every step compiles
to one static program; test-time refinement runs ``subdivision_steps``
rounds of top-N point re-prediction with static N.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..builder import HEADS
from .cascade_decode_head import BaseCascadeDecodeHead


def point_sample(feats, points, align_corners=False, mode='bilinear'):
    """Sample features at normalized points with mmcv ``point_sample``
    semantics: [0,1] coords → ``F.grid_sample`` with
    ``padding_mode='zeros'`` — out-of-bounds taps contribute ZERO (edge
    samples under align_corners=False live half a pixel outside and are
    scaled down, NOT border-replicated; caught by
    test_stock_head_oracles_b3).

    feats (B, H, W, C); points (B, P, 2) in [0, 1] (x, y) → (B, P, C).
    """
    b, h, w, c = feats.shape
    x = points[..., 0]
    y = points[..., 1]
    if align_corners:
        fx = x * (w - 1)
        fy = y * (h - 1)
    else:
        fx = x * w - 0.5
        fy = y * h - 0.5
    if mode == 'nearest':
        # grid_sample nearest: round-half-away semantics are moot for
        # continuous coords; torch rounds to nearest index then zero-pads
        xi = jnp.round(fx).astype(jnp.int32)
        yi = jnp.round(fy).astype(jnp.int32)
        valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
        flat = feats.reshape(b, h * w, c)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        v = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return v * valid[..., None].astype(v.dtype)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    x1 = x0 + 1
    y1 = y0 + 1
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]

    def gather(yi, xi):
        valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
        yic = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xic = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = feats.reshape(b, h * w, c)
        idx = yic * w + xic
        v = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return v * valid[..., None].astype(v.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def calculate_uncertainty(seg_logits):
    """-(top1 - top2) margin uncertainty (B, P, C) → (B, P, 1)."""
    top2 = jax.lax.top_k(seg_logits, 2)[0]
    return (top2[..., 1] - top2[..., 0])[..., None]


@HEADS.register_module()
class PointHead(BaseCascadeDecodeHead):
    """MLP over (fine feature, coarse logits) at sampled points."""
    num_fcs: int = 3
    input_transform: str = 'multiple_select'
    in_index: object = (0,)
    coarse_pred_each_layer: bool = True
    num_points: int = 2048
    oversample_ratio: int = 3
    importance_sample_ratio: float = 0.75
    scale_factor: int = 2
    subdivision_steps: int = 2
    subdivision_num_points: int = 8196

    def _make_mlp(self):
        """Construct the point-MLP modules ONCE (reused across the
        refinement steps — flax submodule names must be unique)."""
        fcs = [nn.Dense(self.channels, name=f'fcs_{i}')
               for i in range(self.num_fcs)]
        fc_seg = nn.Dense(self.num_classes, name='fc_seg')
        return fcs, fc_seg

    @staticmethod
    def _apply_mlp(mods, fine, coarse, coarse_each_layer):
        fcs, fc_seg = mods
        x = jnp.concatenate([fine, coarse], axis=-1)
        for fc in fcs:
            x = nn.relu(fc(x))
            if coarse_each_layer:
                x = jnp.concatenate([x, coarse], axis=-1)
        return fc_seg(x)

    def get_points_train(self, seg_logits, rng):
        """Oversample → top-k uncertain → random fill (static shapes)."""
        b = seg_logits.shape[0]
        n_sampled = int(self.num_points * self.oversample_ratio)
        k1, k2 = jax.random.split(rng)
        rand_points = jax.random.uniform(k1, (b, n_sampled, 2))
        logits_at = point_sample(seg_logits, rand_points)
        unc = calculate_uncertainty(logits_at)[..., 0]
        n_unc = int(self.importance_sample_ratio * self.num_points)
        n_rand = self.num_points - n_unc
        idx = jax.lax.top_k(unc, n_unc)[1]
        chosen = jnp.take_along_axis(rand_points, idx[..., None], axis=1)
        rand_fill = jax.random.uniform(k2, (b, n_rand, 2))
        return jnp.concatenate([chosen, rand_fill], axis=1)

    def _sample_fine(self, x, points):
        if isinstance(x, (list, tuple)):
            return jnp.concatenate(
                [point_sample(xi, points,
                              align_corners=self.align_corners)
                 for xi in x], axis=-1)
        return point_sample(x, points, align_corners=self.align_corners)

    @nn.compact
    def __call__(self, inputs, prev_output, train: bool = False,
                 points=None):
        """Train: point logits at sampled points → (logits, points).
        Eval: iterative subdivision refinement of ``prev_output``
        (reference PointRend test flow), returning a dense seg map.
        """
        x = self._transform_inputs(inputs)
        mlp_mods = self._make_mlp()
        if not train and points is None:
            refined = prev_output
            for _ in range(self.subdivision_steps):
                refined = resize(refined,
                                 scale_factor=self.scale_factor,
                                 mode='bilinear',
                                 align_corners=self.align_corners,
                                 warning=False)
                b, hh, ww, cc = refined.shape
                unc = calculate_uncertainty(
                    refined.reshape(b, hh * ww, cc))[..., 0]
                n = min(self.subdivision_num_points, hh * ww)
                idx = jax.lax.top_k(unc, n)[1]  # most uncertain
                ys = (idx // ww).astype(jnp.float32)
                xs = (idx % ww).astype(jnp.float32)
                pts = jnp.stack([(xs + 0.5) / ww, (ys + 0.5) / hh],
                                axis=-1)
                fine = self._sample_fine(x, pts)
                # reference point_head.py:241-242: coarse feats come from
                # the ORIGINAL prev_output every step, not the refined map
                coarse = point_sample(prev_output, pts,
                                      align_corners=self.align_corners)
                logits = self._apply_mlp(mlp_mods, fine, coarse,
                                         self.coarse_pred_each_layer)
                refined = jax.vmap(
                    lambda f, i, l: f.at[i].set(l))(
                    refined.reshape(b, hh * ww, cc), idx, logits)
                refined = refined.reshape(b, hh, ww, cc)
            return refined
        if points is None:
            rng = self.make_rng('dropout') if train else \
                jax.random.PRNGKey(0)
            points = self.get_points_train(prev_output, rng)
        fine = self._sample_fine(x, points)
        coarse = point_sample(prev_output, points,
                              align_corners=self.align_corners)
        logits = self._apply_mlp(mlp_mods, fine, coarse,
                                 self.coarse_pred_each_layer)
        return logits, points

    def loss_by_feat(self, seg_logit, seg_label, seg_weight=None) -> dict:
        """Point-sampled CE: labels gathered at the same points
        (reference point_head.py:200-205: NEAREST sampling of the label
        map, not bilinear+round)."""
        from ..losses import accuracy
        point_logits, points = seg_logit
        label = seg_label[..., None].astype(jnp.float32)
        point_label = point_sample(label, points, mode='nearest',
                                   align_corners=self.align_corners)[..., 0]
        point_label = point_label.astype(jnp.int32)
        loss = {}
        for loss_decode in self.build_losses():
            name = 'point' + loss_decode.loss_name[4:] \
                if loss_decode.loss_name.startswith('loss') \
                else loss_decode.loss_name
            value = loss_decode(point_logits, point_label,
                                ignore_index=self.ignore_index)
            loss[f'loss_{name}' if not name.startswith('loss') else name] = \
                value
        # reference point_head.py:267-268
        loss['acc_point'] = accuracy(point_logits, point_label,
                                     ignore_index=self.ignore_index)
        return loss
