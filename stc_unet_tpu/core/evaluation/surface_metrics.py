"""Boundary/surface metrics for medical segmentation.

The reference fork gestures at these (``metrics.py``: a random-valued "ASD",
unused ``hausdorff:358``/``compute_RVD:297``/``OR:380``) — SURVEY.md §2.7
marks those as defects. These are the *standard* definitions, implemented
with Euclidean distance transforms (scipy): HD, HD95, ASSD, RVD, and the
overlap ratio.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _surface_distances(pred: np.ndarray, gt: np.ndarray,
                       spacing=None) -> tuple:
    """Distances from each boundary pixel of one mask to the other's
    boundary; returns (d_pred_to_gt, d_gt_to_pred)."""
    from scipy import ndimage
    pred = pred.astype(bool)
    gt = gt.astype(bool)
    if not pred.any() or not gt.any():
        return None, None
    struct = ndimage.generate_binary_structure(pred.ndim, 1)
    pred_border = pred ^ ndimage.binary_erosion(pred, struct)
    gt_border = gt ^ ndimage.binary_erosion(gt, struct)
    dt_gt = ndimage.distance_transform_edt(~gt_border, sampling=spacing)
    dt_pred = ndimage.distance_transform_edt(~pred_border, sampling=spacing)
    return dt_gt[pred_border], dt_pred[gt_border]


def hausdorff_distance(pred, gt, spacing=None,
                       percentile: Optional[float] = None) -> float:
    """Symmetric (percentile-)Hausdorff distance between binary masks."""
    d_pg, d_gp = _surface_distances(pred, gt, spacing)
    if d_pg is None:
        return float('nan')
    if percentile is None:
        return float(max(d_pg.max(initial=0.0), d_gp.max(initial=0.0)))
    alld = np.concatenate([d_pg, d_gp])
    return float(np.percentile(alld, percentile)) if alld.size else 0.0


def hd95(pred, gt, spacing=None) -> float:
    """95th-percentile Hausdorff distance."""
    return hausdorff_distance(pred, gt, spacing, percentile=95)


def average_surface_distance(pred, gt, spacing=None) -> float:
    """Average symmetric surface distance (ASSD)."""
    d_pg, d_gp = _surface_distances(pred, gt, spacing)
    if d_pg is None:
        return float('nan')
    total = d_pg.sum() + d_gp.sum()
    count = d_pg.size + d_gp.size
    return float(total / count) if count else 0.0


def relative_volume_difference(pred, gt) -> float:
    """RVD = (|pred| - |gt|) / |gt| (standard ``compute_RVD``)."""
    vg = float(np.count_nonzero(gt))
    if vg == 0:
        return float('nan')
    return (float(np.count_nonzero(pred)) - vg) / vg


def overlap_ratio(pred, gt) -> float:
    """Volumetric overlap (Jaccard) of binary masks."""
    pred = pred.astype(bool)
    gt = gt.astype(bool)
    union = np.count_nonzero(pred | gt)
    if union == 0:
        return float('nan')
    return float(np.count_nonzero(pred & gt)) / union


def surface_metrics(pred, gt, spacing=None) -> Dict[str, float]:
    """All boundary metrics for one binary mask pair."""
    return dict(
        HD=hausdorff_distance(pred, gt, spacing),
        HD95=hd95(pred, gt, spacing),
        ASSD=average_surface_distance(pred, gt, spacing),
        RVD=relative_volume_difference(pred, gt),
        VOE=1.0 - overlap_ratio(pred, gt)
        if not np.isnan(overlap_ratio(pred, gt)) else float('nan'),
    )
