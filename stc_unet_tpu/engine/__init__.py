from .checkpoint import (load_checkpoint, load_checkpoint_file, restore_into,
                         save_checkpoint)
from .eval_hooks import DistEvalHook, EvalHook
from .extra_hooks import JaxProfilerHook, MMSegWandbHook
from .hooks import (HOOKS, CheckpointHook, DistSamplerSeedHook, Hook,
                    IterTimerHook, LogBuffer, TensorboardLoggerHook,
                    TextLoggerHook, get_priority)
from .runner import (RUNNERS, BaseRunner, EpochBasedRunner, IterBasedRunner,
                     build_runner)
from .train_state import (TrainState, default_data_mesh, make_train_step,
                          make_val_step, total_loss_from_dict)

__all__ = [
    'load_checkpoint', 'load_checkpoint_file', 'restore_into',
    'save_checkpoint', 'DistEvalHook', 'EvalHook', 'HOOKS', 'CheckpointHook',
    'DistSamplerSeedHook', 'Hook', 'IterTimerHook', 'LogBuffer',
    'TensorboardLoggerHook', 'TextLoggerHook', 'get_priority', 'RUNNERS',
    'BaseRunner', 'EpochBasedRunner', 'IterBasedRunner', 'build_runner',
    'TrainState', 'default_data_mesh', 'make_train_step', 'make_val_step',
    'total_loss_from_dict', 'JaxProfilerHook', 'MMSegWandbHook'
]
