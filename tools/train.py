"""Training CLI (≙ reference ``tools/train.py``). argv-compatible:

    python tools/train.py CONFIG [--work-dir D] [--load-from C]
        [--resume-from C] [--no-validate] [--seed N] [--deterministic]
        [--cfg-options K=V ...]
"""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse
import copy
import os
import os.path as osp
import time
import warnings

from stc_unet_tpu import __version__
from stc_unet_tpu.apis import (init_random_seed, set_random_seed,
                               train_segmentor)
from stc_unet_tpu.datasets import build_dataset
from stc_unet_tpu.models import build_segmentor
from stc_unet_tpu.utils import Config, collect_env, get_root_logger


def parse_args():
    parser = argparse.ArgumentParser(description='Train a segmentor')
    parser.add_argument('config', help='train config file path')
    parser.add_argument('--work-dir', help='the dir to save logs and models')
    parser.add_argument('--load-from', help='checkpoint to load weights from')
    parser.add_argument('--resume-from', help='checkpoint to resume from')
    parser.add_argument('--no-validate', action='store_true',
                        help='do not evaluate during training')
    parser.add_argument('--gpus', type=int,
                        help='(deprecated) number of devices')
    parser.add_argument('--gpu-ids', type=int, nargs='+',
                        help='(deprecated) ids of devices to use')
    parser.add_argument('--seed', type=int, default=None, help='random seed')
    parser.add_argument('--deterministic', action='store_true',
                        help='deterministic options (XLA default)')
    parser.add_argument('--cfg-options', nargs='+', action=DictAction,
                        help='override settings, key=value pairs merged into '
                             'the config (nested keys via a.b.c=v)')
    parser.add_argument('--launcher',
                        choices=['none', 'pytorch', 'slurm', 'mpi', 'jax'],
                        default='none', help='job launcher')
    parser.add_argument('--local_rank', type=int, default=0)
    parser.add_argument('--auto-resume', action='store_true',
                        help='resume from the latest checkpoint '
                             'automatically')
    return parser.parse_args()


class DictAction(argparse.Action):
    """``--cfg-options a.b=1 c=[2,3]`` → dict (mmcv DictAction semantics)."""

    @staticmethod
    def _parse_value(val: str):
        import ast
        try:
            return ast.literal_eval(val)
        except (ValueError, SyntaxError):
            if val.lower() in ('true', 'false'):
                return val.lower() == 'true'
            return val

    def __call__(self, parser, namespace, values, option_string=None):
        options = {}
        for kv in values:
            key, val = kv.split('=', maxsplit=1)
            options[key] = self._parse_value(val)
        setattr(namespace, self.dest, options)


def main():
    args = parse_args()
    cfg = Config.fromfile(args.config)
    if args.cfg_options is not None:
        cfg.merge_from_dict(args.cfg_options)

    if args.work_dir is not None:
        cfg.work_dir = args.work_dir
    elif cfg.get('work_dir', None) is None:
        cfg.work_dir = osp.join('./work_dirs',
                                osp.splitext(osp.basename(args.config))[0])
    if args.load_from is not None:
        cfg.load_from = args.load_from
    if args.resume_from is not None:
        cfg.resume_from = args.resume_from
    cfg.auto_resume = args.auto_resume

    # multi-host init (≙ init_dist, reference tools/train.py:155): under jax
    # each host process calls jax.distributed.initialize via launcher env
    distributed = args.launcher != 'none'
    if distributed:
        import jax
        if jax.process_count() == 1:
            try:
                jax.distributed.initialize()
            except Exception as e:  # single-host fallback
                warnings.warn(f'jax.distributed.initialize failed: {e}')

    os.makedirs(osp.abspath(cfg.work_dir), exist_ok=True)
    cfg.dump(osp.join(cfg.work_dir, osp.basename(args.config)))

    timestamp = time.strftime('%Y%m%d_%H%M%S', time.localtime())
    log_file = osp.join(cfg.work_dir, f'{timestamp}.log')
    logger = get_root_logger(log_file=log_file,
                             log_level=getattr(cfg, 'log_level', 'INFO'))

    meta = dict()
    env_info_dict = collect_env()
    env_info = '\n'.join([f'{k}: {v}' for k, v in env_info_dict.items()])
    dash_line = '-' * 60 + '\n'
    logger.info('Environment info:\n' + dash_line + env_info + '\n' +
                dash_line)
    meta['env_info'] = env_info
    logger.info(f'Distributed training: {distributed}')
    logger.info(f'Config:\n{cfg.pretty_text}')

    seed = init_random_seed(args.seed)
    logger.info(f'Set random seed to {seed}, '
                f'deterministic: {args.deterministic}')
    set_random_seed(seed, deterministic=args.deterministic)
    cfg.seed = seed
    meta['seed'] = seed
    meta['exp_name'] = osp.basename(args.config)

    model = build_segmentor(cfg.model,
                            train_cfg=cfg.get('train_cfg'),
                            test_cfg=cfg.get('test_cfg'))
    model.init_weights(seed=seed)
    logger.info(model.__class__.__name__)

    if cfg.data.get('img_cache'):
        # decode-once cache ('ram'/'disk'): the loading transforms serve
        # decoded arrays after epoch 1 instead of re-running PNG decode
        from stc_unet_tpu.datasets import inject_img_cache
        for split in ('train', 'val'):
            if cfg.data.get(split) is not None:
                inject_img_cache(cfg.data[split], cfg.data['img_cache'],
                                 cfg.data.get('img_cache_dir'))
        logger.info('img_cache: %s decode cache enabled',
                    cfg.data['img_cache'])

    datasets = [build_dataset(cfg.data.train)]
    if len(cfg.workflow) == 2:
        val_dataset = copy.deepcopy(cfg.data.val)
        val_dataset.pipeline = cfg.data.train.pipeline
        datasets.append(build_dataset(val_dataset))
    if cfg.get('checkpoint_config') is not None:
        cfg.checkpoint_config['meta'] = dict(
            stc_unet_tpu_version=__version__,
            config=cfg.pretty_text,
            CLASSES=datasets[0].CLASSES,
            PALETTE=datasets[0].PALETTE)
    model.CLASSES = datasets[0].CLASSES
    model.PALETTE = datasets[0].PALETTE

    train_segmentor(
        model, datasets, cfg,
        distributed=distributed,
        validate=not args.no_validate,
        timestamp=timestamp,
        meta=meta)


if __name__ == '__main__':
    main()
