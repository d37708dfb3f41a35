"""FPS benchmark CLI (≙ reference ``tools/benchmark.py``): warmup-skip timing
loop over the test dataset, reporting img/s."""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse
import time

import numpy as np

from stc_unet_tpu.datasets import build_dataloader, build_dataset
from stc_unet_tpu.engine import load_checkpoint
from stc_unet_tpu.models import build_segmentor
from stc_unet_tpu.utils import Config


def parse_args():
    parser = argparse.ArgumentParser(description='Benchmark a segmentor')
    parser.add_argument('config', help='test config file path')
    parser.add_argument('checkpoint', nargs='?', default=None,
                        help='checkpoint file (optional: random init)')
    parser.add_argument('--log-interval', type=int, default=50)
    parser.add_argument('--total-iters', type=int, default=200)
    parser.add_argument('--warmup-iters', type=int, default=5)
    return parser.parse_args()


def main():
    args = parse_args()
    cfg = Config.fromfile(args.config)
    cfg.model.pretrained = None
    cfg.data.test['test_mode'] = True

    dataset = build_dataset(cfg.data.test)
    data_loader = build_dataloader(
        dataset, samples_per_gpu=1,
        workers_per_gpu=cfg.data.workers_per_gpu, dist=False, shuffle=False)

    model = build_segmentor(cfg.model, test_cfg=cfg.get('test_cfg'))
    model.init_weights()
    if args.checkpoint:
        load_checkpoint(model, args.checkpoint)

    total_iters = args.total_iters
    num_warmup = args.warmup_iters
    pure_inf_time = 0
    from stc_unet_tpu.apis.test import _as_test_kwargs
    done = 0
    while done < total_iters:
        for data in data_loader:
            start_time = time.perf_counter()
            result = model(return_loss=False, rescale=True,
                           **_as_test_kwargs(data))
            np.asarray(result[0])  # block
            elapsed = time.perf_counter() - start_time
            done += 1
            if done > num_warmup:
                pure_inf_time += elapsed
                if done % args.log_interval == 0:
                    fps = (done - num_warmup) / pure_inf_time
                    print(f'Done image [{done:3}/{total_iters}], '
                          f'fps: {fps:.2f} img / s')
            if done >= total_iters:
                break
    fps = (total_iters - num_warmup) / pure_inf_time
    print(f'Overall fps: {fps:.2f} img / s')


if __name__ == '__main__':
    main()
