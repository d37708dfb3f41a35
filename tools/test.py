"""Test/eval CLI (≙ reference ``tools/test.py``, author-modified argv:
positional data_root, config resolved from work_dirs, test img/ann dirs
derived from data_root — reference ``test.py:26-29,135,195-197``).

    python tools/test.py DATA_ROOT CONFIG CHECKPOINT [--eval mIoU ...]

``CONFIG`` may be a config *name* (resolved as
``<work_dirs>/<name>/<name>.py``) or a direct path to a config file.
"""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse
import json
import os
import os.path as osp
import time
import warnings

from stc_unet_tpu.apis import multi_gpu_test, single_gpu_test
from stc_unet_tpu.datasets import build_dataloader, build_dataset
from stc_unet_tpu.engine import load_checkpoint
from stc_unet_tpu.models import build_segmentor
from stc_unet_tpu.utils import Config, get_root_logger


def parse_args():
    parser = argparse.ArgumentParser(
        description='stc_unet_tpu test (and eval) a model')
    parser.add_argument('--work_dirs', default='work_dirs',
                        help='work_dirs root for config-name resolution')
    parser.add_argument('data_root', help='test data path (images dir)')
    parser.add_argument('config', help='config name or file path')
    parser.add_argument('checkpoint', help='checkpoint file')
    parser.add_argument('--work-dir',
                        help='dir to dump evaluation metric json into')
    parser.add_argument('--aug-test', action='store_true',
                        help='use flip and multi-scale TTA')
    parser.add_argument('--out', help='output result file in pickle format')
    parser.add_argument('--format-only', action='store_true',
                        help='format results without evaluation')
    parser.add_argument('--eval', type=str,
                        default=['mIoU', 'mFscore', 'mDice'], nargs='+',
                        help='evaluation metrics, e.g. mIoU mDice')
    parser.add_argument('--show', action='store_true', help='show results')
    parser.add_argument('--show-dir',
                        help='directory to save painted images')
    parser.add_argument('--gpu-collect', action='store_true')
    parser.add_argument('--gpu-id', type=int, default=0)
    parser.add_argument('--tmpdir', help='tmp directory for multi-host '
                                         'collection')
    parser.add_argument('--options', nargs='+', help='(deprecated) use '
                                                     '--cfg-options')
    parser.add_argument('--cfg-options', nargs='+',
                        help='config overrides key=value')
    parser.add_argument('--eval-options', nargs='+',
                        help='custom options for evaluation')
    parser.add_argument('--launcher',
                        choices=['none', 'pytorch', 'slurm', 'mpi', 'jax'],
                        default='none')
    parser.add_argument('--opacity', type=float, default=0.5)
    parser.add_argument('--local_rank', type=int, default=0)
    return parser.parse_args()


def _kv_options(pairs):
    if pairs is None:
        return None
    import ast
    out = {}
    for kv in pairs:
        k, v = kv.split('=', maxsplit=1)
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v
    return out


def main():
    args = parse_args()
    assert args.out or args.eval or args.format_only or args.show \
        or args.show_dir, (
            'Please specify at least one operation (--out/--eval/'
            '--format-only/--show/--show-dir)')
    if args.eval and args.format_only:
        raise ValueError('--eval and --format_only cannot be both specified')

    if osp.isfile(args.config):
        cfg_path = args.config
    else:
        cfg_path = osp.join(args.work_dirs, args.config,
                            args.config + '.py')
    cfg = Config.fromfile(cfg_path)
    overrides = _kv_options(args.cfg_options) or _kv_options(args.options)
    if overrides:
        cfg.merge_from_dict(overrides)

    if args.aug_test:
        cfg.data.test.pipeline[1]['img_ratios'] = [
            0.5, 0.75, 1.0, 1.25, 1.5, 1.75]
        cfg.data.test.pipeline[1]['flip'] = True
    cfg.model.pretrained = None
    cfg.data.test['test_mode'] = True

    distributed = args.launcher != 'none'

    cfg_name = osp.splitext(osp.basename(cfg_path))[0]
    work_dir = args.work_dir or osp.join('./work_dirs', cfg_name)
    os.makedirs(osp.abspath(work_dir), exist_ok=True)
    timestamp = time.strftime('%Y%m%d_%H%M%S', time.localtime())
    scale_tag = 'multi_scale' if args.aug_test else 'single_scale'
    json_file = osp.join(work_dir, f'eval_{scale_tag}_{timestamp}.json')

    # test dirs derived from data_root (reference test.py:195-197)
    cfg.data.test['data_root'] = args.data_root
    cfg.data.test['img_dir'] = args.data_root
    cfg.data.test['ann_dir'] = args.data_root.replace('images', 'labels')
    if cfg.data.get('img_cache'):
        from stc_unet_tpu.datasets import inject_img_cache
        inject_img_cache(cfg.data.test, cfg.data['img_cache'],
                         cfg.data.get('img_cache_dir'))
    dataset = build_dataset(cfg.data.test)
    data_loader = build_dataloader(
        dataset, samples_per_gpu=1,
        workers_per_gpu=cfg.data.workers_per_gpu,
        dist=distributed, shuffle=False)

    model = build_segmentor(cfg.model, test_cfg=cfg.get('test_cfg'))
    model.init_weights()
    checkpoint = load_checkpoint(model, args.checkpoint)
    meta = checkpoint.get('meta', {})
    if 'CLASSES' in meta:
        model.CLASSES = tuple(meta['CLASSES'])
    else:
        print('"CLASSES" not found in meta, use dataset.CLASSES instead')
        model.CLASSES = dataset.CLASSES
    if 'PALETTE' in meta:
        model.PALETTE = meta['PALETTE']
    else:
        model.PALETTE = dataset.PALETTE
    model.cfg = cfg

    eval_kwargs = _kv_options(args.eval_options) or {}
    eval_on_format_results = (args.eval is not None
                              and 'cityscapes' in args.eval)
    if eval_on_format_results:
        assert len(args.eval) == 1, 'eval on format results is not ' \
                                    'applicable for metrics other than ' \
                                    'cityscapes'
    format_only = args.format_only or eval_on_format_results
    if format_only:
        eval_kwargs.setdefault('imgfile_prefix', osp.join(work_dir,
                                                          'format_results'))

    pre_eval = args.eval is not None and not eval_on_format_results
    if distributed:
        # multi_gpu_test has no show/out_dir/opacity surface (reference
        # tools/test.py branches identically)
        results = multi_gpu_test(model, data_loader,
                                 tmpdir=osp.join(work_dir, '.dist_test'),
                                 pre_eval=pre_eval,
                                 format_only=format_only,
                                 format_args=eval_kwargs if format_only
                                 else {})
    else:
        results = single_gpu_test(model, data_loader,
                                  show=args.show,
                                  out_dir=args.show_dir,
                                  pre_eval=pre_eval,
                                  format_only=format_only,
                                  format_args=eval_kwargs if format_only
                                  else {},
                                  opacity=args.opacity)

    if args.out:
        import pickle
        warnings.warn('--out writes raw outputs to a pickle file')
        with open(args.out, 'wb') as f:
            pickle.dump(results, f)
    if args.eval and not eval_on_format_results:
        eval_kwargs.pop('imgfile_prefix', None)
        metric = dataset.evaluate(results, metric=args.eval, **eval_kwargs)
        metric_dict = dict(config=cfg_path, metric=metric)
        with open(json_file, 'w') as f:
            json.dump(metric_dict, f, indent=2, default=str)
        print(json.dumps({k: float(v) for k, v in metric.items()},
                         indent=2))


if __name__ == '__main__':
    main()
