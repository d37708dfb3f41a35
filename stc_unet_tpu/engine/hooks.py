"""Hook system (≙ mmcv ``Hook``/``LoggerHook``/``CheckpointHook`` consumed by
the reference's runner, ``apis/train.py:140-170``).

Same lifecycle vocabulary (before_run / before_train_epoch / ... /
after_run) and priorities, so reference training configs (``log_config``,
``checkpoint_config``, ``evaluation``) port unchanged.
"""
from __future__ import annotations

import datetime
import os.path as osp
import time
from typing import Optional

import numpy as np

from stc_unet_tpu.utils import Registry

HOOKS = Registry('hook')

PRIORITIES = {
    'HIGHEST': 0, 'VERY_HIGH': 10, 'HIGH': 30, 'ABOVE_NORMAL': 40,
    'NORMAL': 50, 'BELOW_NORMAL': 60, 'LOW': 70, 'VERY_LOW': 90,
    'LOWEST': 100,
}


def get_priority(priority) -> int:
    if isinstance(priority, int):
        assert 0 <= priority < 100 or priority == 100
        return priority
    return PRIORITIES[priority]


class Hook:
    stages = ('before_run', 'before_train_epoch', 'before_train_iter',
              'after_train_iter', 'after_train_epoch', 'before_val_epoch',
              'before_val_iter', 'after_val_iter', 'after_val_epoch',
              'after_run', 'before_epoch', 'after_epoch', 'before_iter',
              'after_iter')

    def before_run(self, runner):
        pass

    def after_run(self, runner):
        pass

    def before_epoch(self, runner):
        pass

    def after_epoch(self, runner):
        pass

    def before_iter(self, runner):
        pass

    def after_iter(self, runner):
        pass

    def before_train_epoch(self, runner):
        self.before_epoch(runner)

    def before_val_epoch(self, runner):
        self.before_epoch(runner)

    def after_train_epoch(self, runner):
        self.after_epoch(runner)

    def after_val_epoch(self, runner):
        self.after_epoch(runner)

    def before_train_iter(self, runner):
        self.before_iter(runner)

    def before_val_iter(self, runner):
        self.before_iter(runner)

    def after_train_iter(self, runner):
        self.after_iter(runner)

    def after_val_iter(self, runner):
        self.after_iter(runner)

    def every_n_epochs(self, runner, n):
        return (runner.epoch + 1) % n == 0 if n > 0 else False

    def every_n_inner_iters(self, runner, n):
        return (runner.inner_iter + 1) % n == 0 if n > 0 else False

    def every_n_iters(self, runner, n):
        return (runner.iter + 1) % n == 0 if n > 0 else False

    def end_of_epoch(self, runner):
        return runner.inner_iter + 1 == len(runner.data_loader)

    def is_last_epoch(self, runner):
        return runner.epoch + 1 == runner.max_epochs

    def is_last_iter(self, runner):
        return runner.iter + 1 == runner.max_iters


class LogBuffer:
    """Average-by-count buffer for log vars (mmcv LogBuffer semantics)."""

    def __init__(self):
        self.val_history = {}
        self.n_history = {}
        self.output = {}
        self.ready = False

    def clear(self):
        self.val_history.clear()
        self.n_history.clear()
        self.clear_output()

    def clear_output(self):
        self.output.clear()
        self.ready = False

    def update(self, vars: dict, count: int = 1):
        for key, var in vars.items():
            self.val_history.setdefault(key, []).append(var)
            self.n_history.setdefault(key, []).append(count)

    def average(self, n: int = 0):
        """Average the latest n values (0 = all).

        Buffered values may be live device scalars (the train step is
        dispatched asynchronously and nothing reads them back per-iter).
        Gather them in ONE ``jax.device_get`` — it starts every transfer
        async then awaits once, so the readback costs ~1 tunnel RTT
        total instead of one sequential RTT per (key, iter) value
        (measured ~36 ms each on the tunneled chip).
        """
        import jax
        tails = {key: (self.val_history[key][-n:] if n
                       else self.val_history[key])
                 for key in self.val_history}
        tails = jax.device_get(tails)
        for key, values in tails.items():
            values = np.asarray(values, np.float64)
            nums = np.array(self.n_history[key][-n:] if n
                            else self.n_history[key])
            self.output[key] = float(np.sum(values * nums) / np.sum(nums))
        self.ready = True


@HOOKS.register_module()
class IterTimerHook(Hook):
    """Per-iter data_time / time logging (mmcv IterTimerHook)."""

    def before_epoch(self, runner):
        self.t = time.time()

    def before_iter(self, runner):
        runner.log_buffer.update({'data_time': time.time() - self.t})

    def after_iter(self, runner):
        runner.log_buffer.update({'time': time.time() - self.t})
        self.t = time.time()


@HOOKS.register_module()
class TextLoggerHook(Hook):
    """Interval text logging of averaged log vars + lr + ETA
    (≙ mmcv TextLoggerHook; json log line per record like the reference's
    ``.log.json``)."""

    def __init__(self, by_epoch=True, interval=10, ignore_last=True,
                 reset_flag=False, interval_exp_name=1000, out_dir=None,
                 keep_local=True):
        self.by_epoch = by_epoch
        self.interval = interval
        self.ignore_last = ignore_last
        self.json_log_path = None

    def before_run(self, runner):
        self.start_iter = runner.iter
        if runner.work_dir is not None and runner.timestamp is not None:
            self.json_log_path = osp.join(runner.work_dir,
                                          f'{runner.timestamp}.log.json')

    def before_epoch(self, runner):
        # mmcv LoggerHook.before_epoch: epoch averages must not mix in the
        # previous (train/val) epoch's history, and the buffer must not grow
        # unboundedly across a long run
        runner.log_buffer.clear()

    def _log_json(self, record: dict):
        if self.json_log_path is None:
            return
        import json
        with open(self.json_log_path, 'a+') as f:
            json.dump({k: (round(v, 5) if isinstance(v, float) else v)
                       for k, v in record.items()}, f)
            f.write('\n')

    def _log(self, runner, mode: str):
        runner.log_buffer.average(self.interval)
        out = dict(runner.log_buffer.output)
        lr = runner.current_lr()
        record = dict(mode=mode, epoch=runner.epoch + 1, iter=runner.iter + 1,
                      lr=float(lr) if lr is not None else 0.0)
        record.update(out)
        if mode == 'train':
            head = (f'Epoch [{runner.epoch + 1}]'
                    f'[{runner.inner_iter + 1}/{len(runner.data_loader)}]'
                    if self.by_epoch else
                    f'Iter [{runner.iter + 1}/{runner.max_iters}]')
            if 'time' in out:
                eta_sec = out['time'] * (runner.max_iters - runner.iter - 1)
                record['eta'] = str(
                    datetime.timedelta(seconds=int(eta_sec)))
        else:
            head = f'Epoch({mode}) [{runner.epoch + 1}]' \
                   f'[{runner.inner_iter + 1}]'
        kv = ', '.join(f'{k}: {v:.4f}' if isinstance(v, float) else f'{k}: {v}'
                       for k, v in record.items()
                       if k not in ('mode', 'epoch', 'iter'))
        runner.logger.info(f'{head}\t{kv}')
        self._log_json(record)
        runner.log_buffer.clear_output()

    def after_train_iter(self, runner):
        if self.by_epoch and self.every_n_inner_iters(runner, self.interval):
            self._log(runner, 'train')
        elif not self.by_epoch and self.every_n_iters(runner, self.interval):
            self._log(runner, 'train')
        elif self.end_of_epoch(runner) and not self.ignore_last:
            self._log(runner, 'train')

    def after_val_epoch(self, runner):
        runner.log_buffer.average()
        out = dict(runner.log_buffer.output)
        kv = ', '.join(f'{k}: {v:.4f}' for k, v in out.items())
        runner.logger.info(f'Epoch(val) [{runner.epoch}]\t{kv}')
        record = dict(mode='val', epoch=runner.epoch + 1, iter=runner.iter)
        record.update(out)
        self._log_json(record)
        runner.log_buffer.clear_output()


@HOOKS.register_module()
class TensorboardLoggerHook(Hook):
    """TensorBoard scalar logging; degrades to a warning when no writer
    backend is importable (the image ships without the tensorboard pkg)."""

    def __init__(self, log_dir=None, interval=10, by_epoch=True, **kwargs):
        self.log_dir = log_dir
        self.interval = interval
        self.by_epoch = by_epoch
        self.writer = None

    def before_run(self, runner):
        log_dir = self.log_dir or osp.join(runner.work_dir, 'tf_logs')
        try:
            from torch.utils.tensorboard import SummaryWriter
            self.writer = SummaryWriter(log_dir)
        except ImportError:
            runner.logger.warning(
                'tensorboard is not installed; TensorboardLoggerHook is a '
                'no-op')

    def after_train_iter(self, runner):
        if self.writer is None:
            return
        if self.every_n_iters(runner, self.interval):
            runner.log_buffer.average(self.interval)
            for k, v in runner.log_buffer.output.items():
                self.writer.add_scalar(f'train/{k}', v, runner.iter + 1)
            lr = runner.current_lr()
            if lr is not None:
                self.writer.add_scalar('learning_rate', lr, runner.iter + 1)

    def after_run(self, runner):
        if self.writer is not None:
            self.writer.close()


@HOOKS.register_module()
class CheckpointHook(Hook):
    """Interval checkpointing (≙ mmcv CheckpointHook; reference
    ``checkpoint_config``, ``my_config/STC-UNet.py:94-97``)."""

    def __init__(self, interval=-1, by_epoch=True, save_optimizer=True,
                 out_dir=None, max_keep_ckpts=-1, save_last=True, meta=None,
                 **kwargs):
        self.interval = interval
        self.by_epoch = by_epoch
        self.save_optimizer = save_optimizer
        self.out_dir = out_dir
        self.max_keep_ckpts = max_keep_ckpts
        self.save_last = save_last
        self.meta = meta

    def before_run(self, runner):
        if not self.out_dir:
            self.out_dir = runner.work_dir

    def _save(self, runner):
        runner.save_checkpoint(self.out_dir, save_optimizer=self.save_optimizer,
                               by_epoch=self.by_epoch, meta=self.meta,
                               max_keep_ckpts=self.max_keep_ckpts)

    def after_train_epoch(self, runner):
        if not self.by_epoch:
            return
        if self.every_n_epochs(runner, self.interval) or (
                self.save_last and self.is_last_epoch(runner)):
            self._save(runner)

    def after_train_iter(self, runner):
        if self.by_epoch:
            return
        if self.every_n_iters(runner, self.interval) or (
                self.save_last and self.is_last_iter(runner)):
            self._save(runner)


@HOOKS.register_module()
class DistSamplerSeedHook(Hook):
    """Epoch-seeded shuffling (≙ mmcv DistSamplerSeedHook,
    reference ``apis/train.py:147``). The loader's EpochSampler already keys
    its permutation on the epoch; this hook wires the runner epoch in."""

    def before_epoch(self, runner):
        if hasattr(runner.data_loader, 'set_epoch'):
            runner.data_loader.set_epoch(runner.epoch)
