"""EvalHook / DistEvalHook (≙ reference ``core/evaluation/eval_hooks.py:11,61``).

Runs test-time inference on the val loader at the configured interval,
reduces metrics via ``dataset.evaluate``, and tracks/saves the best
checkpoint (``save_best='mIoU'`` — reference ``apis/train.py:170``).

DistEvalHook is an alias: under the pjit design every host computes on its
shard and metric areas are summed across hosts inside ``pre_eval_to_metrics``
aggregation (no BN-buffer broadcast needed — batch_stats are replicated by
construction).
"""
from __future__ import annotations

import os.path as osp
from math import inf
from typing import Optional

import numpy as np

from .hooks import HOOKS, Hook


@HOOKS.register_module()
class EvalHook(Hook):

    rule_map = {'greater': lambda x, y: x > y, 'less': lambda x, y: x < y}
    init_value_map = {'greater': -inf, 'less': inf}
    greater_keys = ['acc', 'top', 'AR@', 'auc', 'precision', 'mAP', 'mDice',
                    'mIoU', 'mAcc', 'aAcc', 'mFscore']
    less_keys = ['loss']

    def __init__(self, dataloader, start=None, interval=1, by_epoch=True,
                 save_best: Optional[str] = None, rule: Optional[str] = None,
                 test_fn=None, greater_keys=None, less_keys=None,
                 out_dir=None, file_client_args=None, pre_eval=True,
                 **eval_kwargs):
        # ≙ mmcv EvalHook's "dataloader must be a pytorch DataLoader"
        # TypeError (reference tests/test_eval_hook.py:43-51): anything
        # without the loader protocol (len + iteration over batches) is
        # rejected up front rather than failing mid-training
        if not (hasattr(dataloader, '__iter__')
                and hasattr(dataloader, '__len__')
                and hasattr(dataloader, 'dataset')):
            raise TypeError('dataloader must be a DataLoader (built by '
                            'build_dataloader), got '
                            f'{type(dataloader).__name__}')
        self.dataloader = dataloader
        self.interval = interval
        self.start = start
        self.by_epoch = by_epoch
        self.save_best = save_best
        self.eval_kwargs = eval_kwargs
        self.initial_flag = True
        self.pre_eval = pre_eval
        self.out_dir = out_dir
        if test_fn is None:
            from stc_unet_tpu.apis import single_gpu_test
            test_fn = single_gpu_test
        self.test_fn = test_fn
        if greater_keys is not None:
            self.greater_keys = greater_keys
        if less_keys is not None:
            self.less_keys = less_keys
        self.best_ckpt_path = None
        if self.save_best is not None:
            self._init_rule(rule, self.save_best)

    def _init_rule(self, rule, key_indicator):
        if rule not in self.rule_map and rule is not None:
            raise KeyError(f'rule must be greater, less or None, got {rule}')
        if rule is None and key_indicator != 'auto':
            kl = key_indicator.lower()
            if any(k.lower() in kl for k in self.greater_keys):
                rule = 'greater'
            elif any(k.lower() in kl for k in self.less_keys):
                rule = 'less'
            else:
                raise ValueError(
                    f'Cannot infer the rule for key {key_indicator}')
        self.rule = rule
        self.key_indicator = key_indicator
        if self.rule is not None:
            self.compare_func = self.rule_map[self.rule]

    def _should_evaluate(self, runner):
        if self.by_epoch:
            current = runner.epoch
            check_time = self.every_n_epochs
        else:
            current = runner.iter
            check_time = self.every_n_iters
        if self.start is None:
            if not check_time(runner, self.interval):
                return False
        elif (current + 1) < self.start:
            return False
        else:
            if (current + 1 - self.start) % self.interval:
                return False
        return True

    def after_train_iter(self, runner):
        if self.by_epoch:
            return
        if self._should_evaluate(runner):
            self._do_evaluate(runner)

    def after_train_epoch(self, runner):
        if not self.by_epoch:
            return
        if self._should_evaluate(runner):
            self._do_evaluate(runner)

    def _do_evaluate(self, runner):
        runner._sync_model()
        results = self.test_fn(runner.model, self.dataloader,
                               pre_eval=self.pre_eval)
        runner.log_buffer.clear()
        runner.log_buffer.output['eval_iter_num'] = len(self.dataloader)
        key_score = self.evaluate(runner, results)
        if self.save_best and key_score is not None:
            self._save_ckpt(runner, key_score)

    def evaluate(self, runner, results):
        eval_res = self.dataloader.dataset.evaluate(
            results, logger=runner.logger, **self.eval_kwargs)
        for name, val in eval_res.items():
            runner.log_buffer.output[name] = val
        runner.log_buffer.ready = True
        if self.save_best is not None:
            if self.key_indicator == 'auto':
                self._init_rule(self.rule, list(eval_res.keys())[0])
            return eval_res[self.key_indicator]
        return None

    def _save_ckpt(self, runner, key_score):
        best_score = runner.meta.setdefault('hook_msgs', {}).get(
            'best_score', self.init_value_map[self.rule]) \
            if runner.meta is not None else self.init_value_map[self.rule]
        if not self.compare_func(key_score, best_score):
            return
        out_dir = self.out_dir or runner.work_dir
        if self.best_ckpt_path and osp.isfile(self.best_ckpt_path):
            import os
            os.remove(self.best_ckpt_path)
        if self.by_epoch:
            cur = f'epoch_{runner.epoch + 1}'
        else:
            cur = f'iter_{runner.iter + 1}'
        name = f'best_{self.key_indicator}_{cur}.ckpt'
        self.best_ckpt_path = osp.join(out_dir, name)
        from .checkpoint import save_checkpoint
        meta = dict(epoch=runner.epoch + 1, iter=runner.iter + 1,
                    best_score=float(key_score))
        if getattr(runner.model, 'CLASSES', None) is not None:
            meta['CLASSES'] = list(runner.model.CLASSES)
        save_checkpoint(self.best_ckpt_path, runner.state.variables,
                        step=int(runner.state.step), meta=meta)
        if runner.meta is not None:
            runner.meta.setdefault('hook_msgs', {})['best_score'] = float(
                key_score)
            runner.meta['hook_msgs']['best_ckpt'] = self.best_ckpt_path
        runner.logger.info(
            f'Now best checkpoint is saved as {name} '
            f'(best {self.key_indicator}={key_score:.4f}).')


@HOOKS.register_module()
class DistEvalHook(EvalHook):
    """Multi-host eval (reference ``eval_hooks.py:61``).

    Each jax process evaluates its loader shard via ``multi_gpu_test``
    (the default ``test_fn``), whose pre_eval results are all-gathered
    across hosts before ``dataset.evaluate`` — so every host sees the FULL
    result list and metric/save_best decisions agree globally (reference
    ``eval_hooks.py:95-100``).

    ``broadcast_bn_buffer`` is accepted for parity but is a structural
    no-op here: the pjit train step keeps ``batch_stats`` replicated by
    construction (cross-device mean inside one program), so there is never
    a divergent BN buffer to broadcast.
    """

    def __init__(self, *args, broadcast_bn_buffer=True, tmpdir=None,
                 gpu_collect=False, **kwargs):
        if kwargs.get('test_fn') is None:
            from stc_unet_tpu.apis import multi_gpu_test
            kwargs['test_fn'] = multi_gpu_test
        super().__init__(*args, **kwargs)
        self.broadcast_bn_buffer = broadcast_bn_buffer
        self.tmpdir = tmpdir
        self.gpu_collect = gpu_collect

    def _do_evaluate(self, runner):
        runner._sync_model()
        tmpdir = self.tmpdir
        if tmpdir is None:
            tmpdir = osp.join(runner.work_dir, '.eval_hook')
        results = self.test_fn(runner.model, self.dataloader, tmpdir=tmpdir,
                               gpu_collect=self.gpu_collect,
                               pre_eval=self.pre_eval)
        runner.log_buffer.clear()
        runner.log_buffer.output['eval_iter_num'] = len(self.dataloader)
        key_score = self.evaluate(runner, results)
        if self.save_best and key_score is not None:
            self._save_ckpt(runner, key_score)
