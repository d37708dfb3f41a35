from .builder import (OPTIMIZER_BUILDERS, OPTIMIZERS, build_optimizer,
                      build_optimizer_tx)
from .lr_schedules import build_lr_schedule

__all__ = ['OPTIMIZER_BUILDERS', 'OPTIMIZERS', 'build_optimizer',
           'build_optimizer_tx', 'build_lr_schedule']
