"""Runners (≙ mmcv ``EpochBasedRunner``/``IterBasedRunner`` that the
reference builds at ``apis/train.py:129``).

The runner owns the host-side loop: epoch/iter bookkeeping, hook dispatch,
checkpoint/resume. The device-side work is one pjit-compiled
``train_step`` (:mod:`stc_unet_tpu.engine.train_state`) — there is no
OptimizerHook because backward+update live inside the compiled step.
"""
from __future__ import annotations

import os
import os.path as osp
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import numpy as np

from stc_unet_tpu.utils import get_root_logger
from .checkpoint import load_checkpoint_file, restore_into, save_checkpoint
from .hooks import HOOKS, Hook, LogBuffer, get_priority
from .train_state import TrainState, make_train_step, make_val_step

RUNNERS = {}


def register_runner(cls):
    RUNNERS[cls.__name__] = cls
    return cls


def build_runner(cfg: dict, default_args: Optional[dict] = None):
    cfg = dict(cfg)
    runner_type = cfg.pop('type')
    if runner_type not in RUNNERS:
        raise KeyError(f'Unknown runner type {runner_type}')
    return RUNNERS[runner_type](**cfg, **(default_args or {}))


class BaseRunner:
    """Shared runner machinery."""

    def __init__(self, model, tx, lr_schedule=None, work_dir=None,
                 logger=None, meta=None, max_epochs=None, max_iters=None,
                 mesh=None, seed=0, compute_dtype=None, remat=False):
        self.model = model
        self.tx = tx
        self.lr_schedule = lr_schedule
        self.work_dir = work_dir
        if work_dir is not None:
            os.makedirs(work_dir, exist_ok=True)
        self.logger = logger or get_root_logger()
        self.meta = meta
        self.mesh = mesh
        self._max_epochs = max_epochs
        self._max_iters = max_iters
        self.epoch = 0
        self.iter = 0
        self.inner_iter = 0
        self.mode = None
        self._hooks: List[Hook] = []
        self.log_buffer = LogBuffer()
        self.data_loader = None
        self.timestamp = time.strftime('%Y%m%d_%H%M%S', time.localtime())
        self.base_rng = jax.random.PRNGKey(seed)

        # functional state
        variables = model.variables if getattr(model, 'variables', None) \
            else model.init_weights()
        self.state = TrainState.create(variables, tx)
        self._train_step = make_train_step(model, tx, mesh=mesh,
                                           compute_dtype=compute_dtype,
                                           remat=remat)
        self._val_step = make_val_step(model, mesh=mesh)

    # -- properties ----------------------------------------------------------
    @property
    def max_epochs(self):
        return self._max_epochs

    @property
    def max_iters(self):
        return self._max_iters

    @property
    def hooks(self):
        return self._hooks

    def current_lr(self):
        if self.lr_schedule is None:
            return None
        return float(self.lr_schedule(self.iter))

    # -- hooks ---------------------------------------------------------------
    def register_hook(self, hook: Hook, priority='NORMAL'):
        priority = get_priority(priority)
        hook.priority = priority
        for i in range(len(self._hooks) - 1, -1, -1):
            if priority >= self._hooks[i].priority:
                self._hooks.insert(i + 1, hook)
                return
        self._hooks.insert(0, hook)

    def register_hook_from_cfg(self, hook_cfg: dict):
        hook_cfg = dict(hook_cfg)
        priority = hook_cfg.pop('priority', 'NORMAL')
        hook = HOOKS.build(hook_cfg)
        self.register_hook(hook, priority=priority)
        return hook

    def call_hook(self, fn_name: str):
        for hook in self._hooks:
            getattr(hook, fn_name)(self)

    def register_training_hooks(self, lr_config=None, optimizer_config=None,
                                checkpoint_config=None, log_config=None,
                                momentum_config=None,
                                timer_config=dict(type='IterTimerHook'),
                                custom_hooks_config=None):
        """mmcv-parity registration (reference ``apis/train.py:140``).

        lr/optimizer configs are accepted for API parity but are no-ops here:
        the LR policy and the update rule are compiled into the train step.
        """
        if timer_config is not None:
            self.register_hook_from_cfg(dict(timer_config))
        if checkpoint_config is not None:
            cfg = dict(checkpoint_config)
            cfg.setdefault('type', 'CheckpointHook')
            self.register_hook(HOOKS.build(cfg), priority='NORMAL')
        if log_config is not None:
            interval = log_config.get('interval', 10)
            for info in log_config['hooks']:
                cfg = dict(info)
                cfg.setdefault('interval', interval)
                cfg.setdefault('by_epoch', isinstance(self, EpochBasedRunner))
                self.register_hook(HOOKS.build(cfg), priority='VERY_LOW')
        for c in (custom_hooks_config or []):
            self.register_hook_from_cfg(dict(c))

    # -- checkpointing -------------------------------------------------------
    def save_checkpoint(self, out_dir, filename_tmpl=None,
                        save_optimizer=True, meta=None, by_epoch=True,
                        create_symlink=True, max_keep_ckpts=-1):
        if by_epoch:
            filename_tmpl = filename_tmpl or 'epoch_{}.ckpt'
            name = filename_tmpl.format(self.epoch + 1)
        else:
            filename_tmpl = filename_tmpl or 'iter_{}.ckpt'
            name = filename_tmpl.format(self.iter + 1)
        meta = dict(meta or {})
        if self.meta is not None:
            meta.update({k: v for k, v in self.meta.items()
                         if k not in ('env_info',)})
        meta.update(epoch=self.epoch + 1, iter=self.iter + 1)
        if getattr(self.model, 'CLASSES', None) is not None:
            meta.setdefault('CLASSES', list(self.model.CLASSES))
        if getattr(self.model, 'PALETTE', None) is not None:
            meta.setdefault('PALETTE', np.asarray(
                self.model.PALETTE).tolist())
        filepath = osp.join(out_dir, name)
        save_checkpoint(filepath, self.state.variables,
                        opt_state=self.state.opt_state if save_optimizer
                        else None,
                        step=int(self.state.step), meta=meta)
        if create_symlink:
            latest = osp.join(out_dir, 'latest.ckpt')
            if osp.lexists(latest):
                os.remove(latest)
            try:
                os.symlink(name, latest)
            except OSError:
                import shutil
                shutil.copy(filepath, latest)
        if max_keep_ckpts > 0:
            prefix = 'epoch_' if by_epoch else 'iter_'
            current = (self.epoch + 1) if by_epoch else (self.iter + 1)
            interval = 1
            ids = []
            for f in os.listdir(out_dir):
                if f.startswith(prefix) and f.endswith('.ckpt'):
                    try:
                        ids.append(int(f[len(prefix):-5]))
                    except ValueError:
                        pass
            for cid in sorted(ids)[:-max_keep_ckpts]:
                path = osp.join(out_dir, f'{prefix}{cid}.ckpt')
                if osp.exists(path):
                    os.remove(path)
        self.logger.info(f'Saved checkpoint to {filepath}')
        return filepath

    def load_checkpoint(self, filename, strict=False):
        """Weights-only load."""
        ckpt = load_checkpoint_file(filename)
        variables = restore_into(self.state.variables, ckpt['variables'])
        self.state = self.state.replace(
            params=variables['params'],
            batch_stats=variables.get('batch_stats',
                                      self.state.batch_stats))
        self._sync_model()
        self.logger.info(f'Loaded checkpoint from {filename}')
        return ckpt

    def resume(self, checkpoint, resume_optimizer=True):
        """Full resume: weights + optimizer + epoch/iter counters."""
        ckpt = self.load_checkpoint(checkpoint)
        meta = ckpt.get('meta', {})
        self.epoch = int(meta.get('epoch', 0))
        self.iter = int(meta.get('iter', 0))
        self.state = self.state.replace(
            step=np.asarray(ckpt.get('step', self.iter), np.int32))
        if resume_optimizer and 'opt_state' in ckpt:
            self.state = self.state.replace(
                opt_state=restore_into(self.state.opt_state,
                                       ckpt['opt_state']))
        self.logger.info(f'resumed epoch {self.epoch}, iter {self.iter}')

    def _sync_model(self):
        """Push functional state into the stateful wrapper (for eval)."""
        self.model.variables = self.state.variables

    # -- core steps ----------------------------------------------------------
    def run_iter(self, data_batch, train_mode: bool):
        img = data_batch['img']
        gt = data_batch['gt_semantic_seg']
        if not isinstance(img, jax.Array):   # device-pipeline batches pass
            img = np.ascontiguousarray(img)  # through without a host copy
        if not isinstance(gt, jax.Array):
            gt = np.ascontiguousarray(gt)
        if train_mode:
            self.state, log_vars = self._train_step(self.state, img, gt,
                                                    self.base_rng)
        else:
            log_vars = self._val_step(self.state, img, gt, self.base_rng)
        self.log_buffer.update(log_vars, count=len(img))
        self.outputs = dict(log_vars=log_vars, num_samples=len(img))


@register_runner
class EpochBasedRunner(BaseRunner):
    """Epoch-driven workflow runner (reference default,
    ``my_config/STC-UNet.py:92``)."""

    def train(self, data_loader, **kwargs):
        self.model_mode = 'train'
        self.mode = 'train'
        self.data_loader = data_loader
        if self._max_iters is None:
            self._max_iters = self._max_epochs * len(data_loader)
        self.call_hook('before_train_epoch')
        if hasattr(data_loader, 'set_epoch'):
            data_loader.set_epoch(self.epoch)
        for i, data_batch in enumerate(data_loader):
            self.inner_iter = i
            self.call_hook('before_train_iter')
            self.run_iter(data_batch, train_mode=True)
            self.call_hook('after_train_iter')
            self.iter += 1
        self.call_hook('after_train_epoch')
        self.epoch += 1

    def val(self, data_loader, **kwargs):
        self.mode = 'val'
        self.data_loader = data_loader
        self.call_hook('before_val_epoch')
        for i, data_batch in enumerate(data_loader):
            self.inner_iter = i
            self.call_hook('before_val_iter')
            self.run_iter(data_batch, train_mode=False)
            self.call_hook('after_val_iter')
        self.call_hook('after_val_epoch')

    def run(self, data_loaders, workflow, max_epochs=None, **kwargs):
        """workflow e.g. [('train', 1)] (reference ``my_config`` line 86)."""
        assert len(data_loaders) == len(workflow)
        if max_epochs is not None:
            self._max_epochs = max_epochs
        assert self._max_epochs is not None
        for i, flow in enumerate(workflow):
            mode, _ = flow
            if mode == 'train':
                self._max_iters = self._max_epochs * len(data_loaders[i])
                break
        self.logger.info('workflow: %s, max: %d epochs', workflow,
                         self._max_epochs)
        self.call_hook('before_run')
        while self.epoch < self._max_epochs:
            for i, flow in enumerate(workflow):
                mode, epochs = flow
                epoch_runner = getattr(self, mode)
                for _ in range(epochs):
                    if mode == 'train' and self.epoch >= self._max_epochs:
                        break
                    epoch_runner(data_loaders[i], **kwargs)
        self._sync_model()
        self.call_hook('after_run')


@register_runner
class IterBasedRunner(BaseRunner):
    """Iteration-driven runner (stock configs use 20k-160k iters)."""

    def run(self, data_loaders, workflow, max_iters=None, **kwargs):
        assert len(data_loaders) == len(workflow)
        if max_iters is not None:
            self._max_iters = max_iters
        assert self._max_iters is not None
        self.logger.info('workflow: %s, max: %d iters', workflow,
                         self._max_iters)
        self.call_hook('before_run')
        iter_loaders = [_InfiniteLoader(dl, self) for dl in data_loaders]
        self.call_hook('before_train_epoch')
        while self.iter < self._max_iters:
            for i, flow in enumerate(workflow):
                mode, iters = flow
                if mode == 'train':
                    for _ in range(iters):
                        if self.iter >= self._max_iters:
                            break
                        self.mode = 'train'
                        self.data_loader = iter_loaders[i].loader
                        self.inner_iter = self.iter
                        self.call_hook('before_train_iter')
                        self.run_iter(next(iter_loaders[i]), train_mode=True)
                        self.call_hook('after_train_iter')
                        self.iter += 1
                else:
                    for _ in range(iters):
                        self.mode = 'val'
                        self.data_loader = iter_loaders[i].loader
                        self.call_hook('before_val_iter')
                        self.run_iter(next(iter_loaders[i]), train_mode=False)
                        self.call_hook('after_val_iter')
        self.call_hook('after_train_epoch')
        self._sync_model()
        self.call_hook('after_run')

    def train(self, data_loader, **kwargs):  # pragma: no cover - API parity
        raise NotImplementedError('IterBasedRunner is driven via run()')

    def val(self, data_loader, **kwargs):  # pragma: no cover
        raise NotImplementedError


class _InfiniteLoader:
    """Epoch-cycling iterator with epoch-seeded reshuffles."""

    def __init__(self, loader, runner):
        self.loader = loader
        self.runner = runner
        self._epoch = 0
        self._it = iter(loader)

    def __next__(self):
        try:
            return next(self._it)
        except StopIteration:
            self._epoch += 1
            self.runner.epoch = self._epoch
            if hasattr(self.loader, 'set_epoch'):
                self.loader.set_epoch(self._epoch)
            self._it = iter(self.loader)
            return next(self._it)
