"""OHEM pixel sampler (≙ reference ``core/seg/sampler/ohem_pixel_sampler.py:11``).

Online hard-example mining as a pure jnp function: returns a per-pixel weight
map in which only the hardest pixels get weight 1. TPU-native notes: the
reference masks valid pixels then sorts the *variable-length* vector; under
XLA we need static shapes, so invalid pixels are pushed to the worst end of a
full-size sort instead (identical selection semantics, fixed shapes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..builder import PIXEL_SAMPLERS
from .base_pixel_sampler import BasePixelSampler


@PIXEL_SAMPLERS.register_module()
class OHEMPixelSampler(BasePixelSampler):
    """Sample hardest pixels by gt-class probability or per-pixel loss.

    Args mirror the reference: ``context`` is the decode head (supplies
    ``ignore_index`` and ``loss_decode``); ``thresh`` selects the
    prob-threshold mode; ``min_kept`` pixels per image are always kept.
    """

    def __init__(self, context, thresh=None, min_kept=100000):
        super().__init__()
        assert min_kept > 1
        self.context = context
        self.thresh = thresh
        self.min_kept = min_kept

    def sample(self, seg_logit, seg_label):
        """seg_logit (N, H, W, C) float; seg_label (N, H, W) int →
        seg_weight (N, H, W) float (no gradient flows through it)."""
        seg_logit = jax.lax.stop_gradient(seg_logit)
        seg_label = jax.lax.stop_gradient(seg_label)
        if seg_label.ndim == 4:
            seg_label = seg_label[..., 0]
        # reference ``ohem_pixel_sampler.py:51``: spatial sizes must match
        assert seg_logit.shape[1:3] == seg_label.shape[1:3], \
            (f'seg_logit spatial {seg_logit.shape[1:3]} != seg_label '
             f'spatial {seg_label.shape[1:3]}')
        ignore_index = self.context.ignore_index
        valid_mask = seg_label != ignore_index
        batch_kept = self.min_kept * seg_label.shape[0]
        safe_label = jnp.where(valid_mask, seg_label, 0)

        if self.thresh is not None:
            seg_prob = jax.nn.softmax(seg_logit, axis=-1)
            gt_prob = jnp.take_along_axis(
                seg_prob, safe_label[..., None], axis=-1)[..., 0]
            # invalid pixels get prob=+inf so they sort to the confident end
            flat = jnp.where(valid_mask, gt_prob, jnp.inf).reshape(-1)
            sort_prob = jnp.sort(flat)
            num_valid = jnp.sum(valid_mask)
            # reference indexes sort_prob[min(batch_kept, numel - 1)]
            k = jnp.clip(jnp.minimum(batch_kept, num_valid - 1), 0,
                         flat.size - 1)
            min_threshold = sort_prob[k]
            threshold = jnp.maximum(min_threshold, self.thresh)
            weight = (gt_prob < threshold).astype(seg_logit.dtype)
        else:
            losses_cfg = self.context.loss_decode
            if isinstance(losses_cfg, dict):
                losses_cfg = [losses_cfg]
            from stc_unet_tpu.models.builder import build_loss
            losses = 0.
            for cfg in losses_cfg:
                loss_fn = build_loss(dict(cfg))
                losses = losses + loss_fn(
                    seg_logit, seg_label, weight=None,
                    ignore_index=ignore_index, reduction_override='none')
            # reference keeps EXACTLY the top batch_kept valid pixels by
            # descending sort index (ties included deterministically) —
            # select by rank, not by a > threshold (which drops all ties):
            # rank = position of each pixel in the descending sort
            # (invalid pixels carry -inf so they rank last)
            flat = jnp.where(valid_mask, losses, -jnp.inf).reshape(-1)
            order = jnp.argsort(-flat)
            rank = jnp.argsort(order)
            weight = (rank < batch_kept).astype(seg_logit.dtype).reshape(
                losses.shape)

        return jnp.where(valid_mask, weight, 0.0)
