from stc_unet_tpu.engine.eval_hooks import DistEvalHook, EvalHook

from .class_names import get_classes, get_palette
from .surface_metrics import (average_surface_distance,
                              hausdorff_distance, hd95, overlap_ratio,
                              relative_volume_difference, surface_metrics)
from .metrics import (eval_metrics, f_score, intersect_and_union, mean_dice,
                      mean_fscore, mean_iou, pre_eval_to_metrics,
                      total_area_to_metrics, total_intersect_and_union)

__all__ = [
    'DistEvalHook', 'EvalHook', 'get_classes', 'get_palette', 'eval_metrics', 'f_score',
    'intersect_and_union', 'mean_dice', 'mean_fscore', 'mean_iou',
    'pre_eval_to_metrics', 'total_area_to_metrics',
    'total_intersect_and_union', 'average_surface_distance',
    'hausdorff_distance', 'hd95', 'overlap_ratio',
    'relative_volume_difference', 'surface_metrics'
]
