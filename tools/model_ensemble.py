"""Multi-model logit ensemble inference
(≙ reference ``tools/model_ensemble.py``)."""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse
import os

import numpy as np
from PIL import Image

from stc_unet_tpu.datasets import build_dataloader, build_dataset
from stc_unet_tpu.engine import load_checkpoint
from stc_unet_tpu.models import build_segmentor
from stc_unet_tpu.utils import Config


def parse_args():
    parser = argparse.ArgumentParser(description='Model ensemble inference')
    parser.add_argument('--config', type=str, nargs='+',
                        help='ensemble config files')
    parser.add_argument('--checkpoint', type=str, nargs='+',
                        help='ensemble checkpoint files')
    parser.add_argument('--aug-test', action='store_true')
    parser.add_argument('--out', type=str, default='results',
                        help='output directory')
    return parser.parse_args()


def main():
    args = parse_args()
    assert len(args.config) == len(args.checkpoint)
    models, loaders = [], []
    for cfg_path, ckpt_path in zip(args.config, args.checkpoint):
        cfg = Config.fromfile(cfg_path)
        if args.aug_test:
            cfg.data.test.pipeline[1]['img_ratios'] = [
                0.5, 0.75, 1.0, 1.25, 1.5, 1.75]
            cfg.data.test.pipeline[1]['flip'] = True
        cfg.model.pretrained = None
        cfg.data.test['test_mode'] = True
        model = build_segmentor(cfg.model, test_cfg=cfg.get('test_cfg'))
        model.init_weights()
        load_checkpoint(model, ckpt_path)
        model.cfg = cfg
        models.append(model)
        dataset = build_dataset(cfg.data.test)
        loaders.append(build_dataloader(
            dataset, samples_per_gpu=1,
            workers_per_gpu=cfg.data.workers_per_gpu, dist=False,
            shuffle=False))
    os.makedirs(args.out, exist_ok=True)
    from stc_unet_tpu.apis.test import _as_test_kwargs
    for batch_i, datas in enumerate(zip(*loaders)):
        logit_sum = None
        meta = None
        for model, data in zip(models, datas):
            kw = _as_test_kwargs(data)
            meta = kw['img_metas'][0]
            logits = model.aug_test_logits(kw['img'], kw['img_metas']) \
                if len(kw['img']) > 1 else \
                model.simple_test_logits(kw['img'], kw['img_metas'])
            logit_sum = logits if logit_sum is None else logit_sum + logits
        pred = np.argmax(logit_sum, axis=-1)[0].astype(np.uint8)
        filename = meta[0].get('ori_filename') or f'{batch_i}.png'
        out_path = _osp.join(args.out,
                             _osp.splitext(_osp.basename(filename))[0]
                             + '.png')
        Image.fromarray(pred).save(out_path)
    print(f'ensemble results written to {args.out}')


if __name__ == '__main__':
    main()
