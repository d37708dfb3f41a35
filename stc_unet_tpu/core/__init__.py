from .evaluation import (eval_metrics, f_score, get_classes, get_palette,
                         intersect_and_union, mean_dice, mean_fscore,
                         mean_iou, pre_eval_to_metrics, total_area_to_metrics,
                         total_intersect_and_union)
from .optimizers import (OPTIMIZER_BUILDERS, OPTIMIZERS,
                         LayerDecayOptimizerConstructor,
                         LearningRateDecayOptimizerConstructor,
                         build_lr_schedule, build_optimizer,
                         build_optimizer_constructor, build_optimizer_tx,
                         layer_decay_multipliers)
from .hook import MMSegWandbHook
from .seg import (PIXEL_SAMPLERS, BasePixelSampler, OHEMPixelSampler,
                  build_pixel_sampler)
from .utils import add_prefix

__all__ = [
    'eval_metrics', 'f_score', 'get_classes', 'get_palette',
    'intersect_and_union', 'mean_dice', 'mean_fscore', 'mean_iou',
    'pre_eval_to_metrics', 'total_area_to_metrics',
    'total_intersect_and_union', 'OPTIMIZER_BUILDERS', 'OPTIMIZERS',
    'build_lr_schedule', 'build_optimizer', 'build_optimizer_constructor', 'build_optimizer_tx',
    'LayerDecayOptimizerConstructor', 'LearningRateDecayOptimizerConstructor',
    'layer_decay_multipliers',
    'PIXEL_SAMPLERS', 'BasePixelSampler', 'OHEMPixelSampler',
    'build_pixel_sampler', 'add_prefix', 'MMSegWandbHook'
]
