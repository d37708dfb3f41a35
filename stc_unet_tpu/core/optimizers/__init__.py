from .builder import (OPTIMIZER_BUILDERS, OPTIMIZERS, build_optimizer,
                      build_optimizer_constructor, build_optimizer_tx)
from .layer_decay import (LayerDecayOptimizerConstructor,
                          LearningRateDecayOptimizerConstructor,
                          layer_decay_multipliers)
from .lr_schedules import build_lr_schedule

__all__ = ['OPTIMIZER_BUILDERS', 'OPTIMIZERS', 'build_optimizer',
           'build_optimizer_constructor', 'build_optimizer_tx', 'build_lr_schedule',
           'LayerDecayOptimizerConstructor',
           'LearningRateDecayOptimizerConstructor',
           'layer_decay_multipliers']
