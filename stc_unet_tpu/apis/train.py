"""Training API (≙ reference ``mmseg/apis/train.py``)."""
from __future__ import annotations

import random
import warnings
from typing import Optional

import jax
import numpy as np

from stc_unet_tpu.core import build_lr_schedule, build_optimizer_tx
from stc_unet_tpu.datasets import build_dataloader, build_dataset
from stc_unet_tpu.engine import (DistEvalHook, EvalHook, build_runner,
                                 default_data_mesh)
from stc_unet_tpu.utils import find_latest_checkpoint, get_root_logger


def init_random_seed(seed: Optional[int] = None, device=None) -> int:
    """Pick a shared seed (reference ``apis/train.py:21``).

    Multi-host: every jax process derives the same seed from process 0 via
    a broadcast (≙ the reference's dist.broadcast of a random tensor).
    """
    if seed is not None:
        return seed
    seed = np.random.randint(2**31)
    if jax.process_count() > 1:
        try:
            from jax.experimental import multihost_utils
            seed = int(multihost_utils.broadcast_one_to_all(
                np.asarray(seed, np.int64)))
        except Exception:  # pragma: no cover - single-host fallback
            pass
    return seed


def set_random_seed(seed: int, deterministic: bool = False):
    """Seed host RNGs (reference ``apis/train.py:52``). Device-side
    randomness flows from explicit PRNGKeys (deterministic by default under
    XLA — the ``deterministic`` flag is accepted for parity)."""
    random.seed(seed)
    np.random.seed(seed)


def train_segmentor(model, dataset, cfg, distributed=False, validate=False,
                    timestamp=None, meta=None):
    """Launch training (reference ``apis/train.py:71``).

    TPU mapping: DataLoader feeds host batches; a 1-D 'data' mesh over all
    local devices shards them; the pjit train step embodies DDP
    (SURVEY.md §2.9). ``distributed=True`` keeps API parity — device
    parallelism engages whenever more than one chip is visible.
    """
    logger = get_root_logger(log_level=cfg.log_level)
    dataset = dataset if isinstance(dataset, (list, tuple)) else [dataset]

    num_devices = jax.local_device_count()
    data_loaders = [
        build_dataloader(
            ds,
            cfg.data.samples_per_gpu,
            cfg.data.workers_per_gpu,
            num_gpus=num_devices,
            dist=distributed,
            seed=cfg.get('seed', 0),
            # pad-to-divisible (never drop): every batch is full → one
            # static shape for jit, and small datasets still train
            drop_last=False,
            num_replicas=jax.process_count(),
            rank=jax.process_index()) for ds in dataset
    ]

    # on-device augmentation (BASELINE north star): finish each uint8 host
    # batch with one jitted crop/flip/photometric/normalize program
    if cfg.data.get('device_pipeline'):
        from stc_unet_tpu.datasets import wrap_loader_with_device_pipeline
        host_size = cfg.data.get('device_pipeline_size')

        def _find_pipeline(dcfg):
            """Resolve the pipeline through wrapper-dataset cfgs
            (RepeatDataset/ConcatDataset/MultiImageMix nesting)."""
            if isinstance(dcfg, (list, tuple)):
                dcfg = dcfg[0]
            if 'pipeline' in dcfg:
                return dcfg['pipeline']
            if 'dataset' in dcfg:
                return _find_pipeline(dcfg['dataset'])
            if 'datasets' in dcfg:
                return _find_pipeline(dcfg['datasets'])
            raise ValueError('no pipeline found in data.train cfg')

        for i, (dl, ds) in enumerate(zip(data_loaders, dataset)):
            try:
                data_loaders[i] = wrap_loader_with_device_pipeline(
                    dl, ds, _find_pipeline(cfg.data.train),
                    host_size=host_size, seed=cfg.get('seed', 0) or 0,
                    prefetch=cfg.data.get('device_pipeline_prefetch', 2))
                logger.info('device_pipeline: on-device augmentation '
                            'enabled for loader %d', i)
            except (ValueError, KeyError) as e:
                warnings.warn(f'device_pipeline requested but the train '
                              f'pipeline is not device-expressible ({e}); '
                              'falling back to the host pipeline')

    mesh = default_data_mesh() if num_devices > 1 else None

    # schedule + optimizer compiled together (reference splits them into
    # optimizer + LrUpdaterHook; here the policy is part of the step)
    runner_cfg = dict(cfg.runner) if cfg.get('runner') else dict(
        type='IterBasedRunner', max_iters=cfg.total_iters)
    iters_per_epoch = len(data_loaders[0])
    if runner_cfg['type'] == 'EpochBasedRunner':
        max_iters = runner_cfg['max_epochs'] * iters_per_epoch
    else:
        max_iters = runner_cfg['max_iters']
    schedule = build_lr_schedule(cfg.get('lr_config'), cfg.optimizer['lr'],
                                 max_iters, iters_per_epoch)
    if model.variables is None:
        model.init_weights(seed=cfg.get('seed', 0) or 0)
    tx = build_optimizer_tx(cfg.optimizer, schedule=schedule,
                            params=model.variables['params'])

    # mixed precision (≙ reference fp16/auto_fp16): bf16 activations on TPU
    compute_dtype = None
    if cfg.get('fp16') is not None or cfg.get('bf16') is not None:
        import jax.numpy as jnp
        compute_dtype = jnp.bfloat16
    runner = build_runner(
        runner_cfg,
        default_args=dict(model=model, tx=tx, lr_schedule=schedule,
                          work_dir=cfg.work_dir, logger=logger, meta=meta,
                          mesh=mesh, seed=cfg.get('seed', 0) or 0,
                          compute_dtype=compute_dtype,
                          remat=bool(cfg.get('remat', False))))
    if timestamp is not None:
        runner.timestamp = timestamp

    runner.register_training_hooks(
        lr_config=cfg.get('lr_config'),
        optimizer_config=cfg.get('optimizer_config'),
        checkpoint_config=cfg.get('checkpoint_config'),
        log_config=cfg.get('log_config'),
        momentum_config=cfg.get('momentum_config'),
        custom_hooks_config=cfg.get('custom_hooks'))

    runner.register_hook_from_cfg(dict(type='DistSamplerSeedHook'))

    if validate:
        val_dataset = build_dataset(cfg.data.val, dict(test_mode=True))
        val_dataloader = build_dataloader(
            val_dataset,
            samples_per_gpu=1,
            workers_per_gpu=cfg.data.workers_per_gpu,
            dist=distributed,
            shuffle=False)
        eval_cfg = dict(cfg.get('evaluation', {}))
        eval_cfg['by_epoch'] = runner_cfg['type'] != 'IterBasedRunner'
        eval_hook = DistEvalHook if distributed else EvalHook
        runner.register_hook(
            eval_hook(val_dataloader, **eval_cfg), priority='LOW')

    resume_from = None
    if cfg.get('auto_resume'):
        resume_from = find_latest_checkpoint(cfg.work_dir)
        if resume_from is not None:
            logger.info(f'auto-resume from {resume_from}')
    if resume_from is not None:
        cfg.resume_from = resume_from
    if cfg.get('resume_from'):
        runner.resume(cfg.resume_from)
    elif cfg.get('load_from'):
        runner.load_checkpoint(cfg.load_from)
    runner.run(data_loaders, cfg.workflow)
    return runner
