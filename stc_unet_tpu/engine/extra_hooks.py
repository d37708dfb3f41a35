"""Extra hooks: W&B logging (≙ reference ``core/hook/wandblogger_hook.py:15``)
and a jax.profiler trace hook (the TPU-native answer to the reference's
IterTimer-only observability, SURVEY.md §5)."""
from __future__ import annotations

import os.path as osp
from typing import Optional

from .hooks import HOOKS, Hook


@HOOKS.register_module()
class MMSegWandbHook(Hook):
    """Weights & Biases logging: config, per-interval scalars, checkpoint
    artifacts. Degrades to a warning when wandb is not installed."""

    def __init__(self, init_kwargs=None, interval=50,
                 log_checkpoint=False, log_checkpoint_metadata=False,
                 num_eval_images=100, **kwargs):
        self.init_kwargs = init_kwargs or {}
        self.interval = interval
        self.log_checkpoint = log_checkpoint
        self.wandb = None

    def before_run(self, runner):
        try:
            import wandb
            self.wandb = wandb
            wandb.init(**self.init_kwargs)
            if runner.meta and 'exp_name' in runner.meta:
                wandb.config.update({'exp_name': runner.meta['exp_name']})
        except ImportError:
            runner.logger.warning(
                'wandb is not installed; MMSegWandbHook is a no-op')

    def after_train_iter(self, runner):
        if self.wandb is None:
            return
        if self.every_n_iters(runner, self.interval):
            runner.log_buffer.average(self.interval)
            self.wandb.log(dict(runner.log_buffer.output),
                           step=runner.iter + 1)

    def after_train_epoch(self, runner):
        if self.wandb is None or not self.log_checkpoint:
            return
        latest = osp.join(runner.work_dir, 'latest.ckpt')
        if osp.exists(latest):
            art = self.wandb.Artifact(f'run_{self.wandb.run.id}_model',
                                      type='model')
            art.add_file(latest)
            self.wandb.log_artifact(art)

    def after_run(self, runner):
        if self.wandb is not None:
            self.wandb.finish()


@HOOKS.register_module()
class JaxProfilerHook(Hook):
    """Capture a jax.profiler trace for a window of training steps.

    TPU-native observability: the trace opens in TensorBoard/Perfetto and
    shows per-op device time, HBM traffic and ICI collectives.
    """

    def __init__(self, start_iter=10, num_iters=5, log_dir=None):
        self.start_iter = start_iter
        self.num_iters = num_iters
        self.log_dir = log_dir
        self._active = False

    def before_train_iter(self, runner):
        if runner.iter == self.start_iter and not self._active:
            import jax
            log_dir = self.log_dir or osp.join(runner.work_dir, 'profile')
            jax.profiler.start_trace(log_dir)
            self._active = True

    def after_train_iter(self, runner):
        if self._active and runner.iter >= self.start_iter + \
                self.num_iters - 1:
            import jax
            jax.profiler.stop_trace()
            self._active = False
            runner.logger.info(
                f'profiler trace written to '
                f'{self.log_dir or osp.join(runner.work_dir, "profile")}')
