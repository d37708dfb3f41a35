"""Trained-eval parity for a STOCK-ZOO pipeline: PSPNet-R50-D8
(VERDICT r4 #7).

The fork family has trajectory + trained-checkpoint parity
(PARITY_KITS_TRAINED.json); this extends the same protocol to the stock
zoo: train PSPNet (ResNetV1c-50, output-stride 8, PSP head — reference
``configs/_base_/models/pspnet_r50-d8.py`` + ``decode_heads/psp_head.py:11``
+ ``backbones/resnet.py``) on the learnable pseudo-KiTS fixture through the
REAL CLI, evaluate via ``tools/test.py``, then re-run inference in plain
torch DIRECTLY FROM the trained flax variables (the oracle-test protocol at
full-model scale) and compare mDice/mIoU.

    python tools/parity_pspnet.py --out PARITY_PSPNET.json
        [--size 256] [--epochs 12] [--platform '']
"""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import argparse
import json
import os
import runpy
import tempfile

from tools.parity_trained import build_learnable_kits, mean_data_time  # noqa


def write_cfg(path: str, data_root: str, epochs: int, batch: int,
              size: int):
    cfg = f'''
_base_ = [{_osp.join(_repo, 'my_config', '_base_kits19.py')!r},
          {_osp.join(_repo, 'configs', '_base_', 'models',
                     'pspnet_r50-d8.py')!r}]
norm_cfg = dict(type='BN', requires_grad=True)
# _base_kits19 carries the fork's OLD-STYLE outer train_cfg/test_cfg while
# the stock model file carries them inside `model` — null the outer pair so
# build_segmentor sees exactly one source
train_cfg = None
test_cfg = None
model = dict(
    pretrained=None,
    backbone=dict(norm_cfg=norm_cfg),
    decode_head=dict(num_classes=2, norm_cfg=norm_cfg),
    auxiliary_head=dict(num_classes=2, norm_cfg=norm_cfg),
    test_cfg=dict(mode='whole'))
crop_size = ({size}, {size})
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations'),
    dict(type='Resize', img_scale=({size}, {size}), keep_ratio=False),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1], to_rgb=True),
    dict(type='Pad', size=crop_size, pad_val=0, seg_pad_val=255),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect', keys=['img', 'gt_semantic_seg'])
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(
        type='MultiScaleFlipAug',
        img_scale=crop_size,
        flip=False,
        transforms=[
            dict(type='Resize', keep_ratio=False),
            dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1],
                 to_rgb=True),
            dict(type='ImageToTensor', keys=['img']),
            dict(type='Collect', keys=['img'])
        ])
]
data = dict(samples_per_gpu={batch}, workers_per_gpu=2,
            train=dict(data_root={data_root!r}, pipeline=train_pipeline),
            val=dict(data_root={data_root!r}, pipeline=test_pipeline),
            test=dict(data_root={data_root!r}, pipeline=test_pipeline))
optimizer = dict(type='Adam', lr=3e-4, betas=(0.9, 0.999))
runner = dict(type='EpochBasedRunner', max_epochs={epochs})
checkpoint_config = dict(by_epoch=True, interval={epochs},
                         save_optimizer=False)
evaluation = dict(interval={epochs + 1}, metric=['mDice'])
log_config = dict(interval=1, hooks=[dict(type='TextLoggerHook')])
bf16 = True
'''
    with open(path, 'w') as f:
        f.write(cfg)


# ----------------------------------------------------------------------
# torch-side PSPNet forward straight from the flax variable tree
# ----------------------------------------------------------------------

def _flat(variables):
    import numpy as np
    out = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict) or hasattr(v, 'items'):
                walk(v, prefix + (k,))
            else:
                out['/'.join(prefix + (k,))] = np.asarray(v, np.float32)
    walk(variables['params'], ())
    walk(variables.get('batch_stats', {}), ())
    return out


def _torch_pspnet_logits(fv, img_nchw):
    """PSPNet-R50-D8 eval forward (reference psp_head.py:11 + resnet.py +
    encoder_decoder.py whole-mode) in plain torch."""
    import numpy as np
    import torch
    import torch.nn.functional as F

    def t(a):
        return torch.from_numpy(np.ascontiguousarray(a))

    def bn(x, name):
        return F.batch_norm(
            x, t(fv[f'{name}/mean']), t(fv[f'{name}/var']),
            t(fv[f'{name}/scale']), t(fv[f'{name}/bias']),
            training=False, eps=1e-5)

    def conv(x, name, stride=1, padding=0, dilation=1):
        w = t(fv[f'{name}/conv/kernel'].transpose(3, 2, 0, 1))
        b = fv.get(f'{name}/conv/bias')
        return F.conv2d(x, w, t(b) if b is not None else None,
                        stride=stride, padding=padding, dilation=dilation)

    def cm(x, name, stride=1, padding=0, act=True):
        w = t(fv[f'{name}/conv_m/conv/kernel'].transpose(3, 2, 0, 1))
        b = fv.get(f'{name}/conv_m/conv/bias')
        x = F.conv2d(x, w, t(b) if b is not None else None, stride=stride,
                     padding=padding)
        if f'{name}/bn/scale' in fv:
            x = bn(x, f'{name}/bn')
        return F.relu(x) if act else x

    def bottleneck(x, p, stride, dilation, ds):
        idn = x
        out = F.relu(bn(conv(x, f'{p}/conv1'), f'{p}/bn1'))
        out = F.relu(bn(conv(out, f'{p}/conv2', stride, padding=dilation,
                             dilation=dilation), f'{p}/bn2'))
        out = bn(conv(out, f'{p}/conv3'), f'{p}/bn3')
        if ds:
            idn = bn(conv(x, f'{p}/downsample/0', stride),
                     f'{p}/downsample/1')
        return F.relu(out + idn)

    x = img_nchw
    pre = 'backbone'
    for j in range(3):
        x = F.relu(bn(conv(x, f'{pre}/stem_conv{j}', 2 if j == 0 else 1,
                           padding=1), f'{pre}/stem_bn{j}'))
    x = F.max_pool2d(x, 3, 2, padding=1)
    in_ch = x.shape[1]
    feats = []
    strides, dilations = (1, 2, 1, 1), (1, 1, 2, 4)
    for s, nb in enumerate((3, 4, 6, 3)):
        planes = 64 * 2 ** s
        dil_s = dilations[s]
        for i in range(nb):
            # contract_dilation: first block of a dilated stage halves
            dil = dil_s // 2 if (i == 0 and dil_s > 1) else dil_s
            stride = strides[s] if i == 0 else 1
            ds = i == 0 and (stride != 1 or in_ch != planes * 4)
            x = bottleneck(x, f'{pre}/layer{s + 1}/{i}', stride, dil, ds)
            in_ch = planes * 4
        feats.append(x)
    # PSPHead on feats[3]: [x] + pooled branches (512 each), 3x3 bottleneck
    import torch
    x4 = feats[3]
    outs = [x4]
    for i, sc in enumerate((1, 2, 3, 6)):
        p = F.adaptive_avg_pool2d(x4, sc)
        p = cm(p, f'decode_head/psp_modules/{i}')
        outs.append(F.interpolate(p, size=x4.shape[2:], mode='bilinear',
                                  align_corners=False))
    y = cm(torch.cat(outs, 1), 'decode_head/bottleneck', padding=1)
    return conv(y, 'decode_head/conv_seg')


def torch_eval(variables, data_root: str, n_test: int, size: int):
    import numpy as np
    import torch
    from PIL import Image
    fv = _flat(variables)
    inter = np.zeros(2)
    den = np.zeros(2)
    iou_den = np.zeros(2)
    for i in range(n_test):
        img = np.asarray(Image.open(
            f'{data_root}/test/images/case_{i:05d}.png').convert('RGB'),
            np.float32)
        gt = np.asarray(Image.open(
            f'{data_root}/test/labels/case_{i:05d}.png'), np.int64)
        x = torch.from_numpy(img.transpose(2, 0, 1))[None]
        with torch.no_grad():
            logits = _torch_pspnet_logits(fv, x)
            logits = torch.nn.functional.interpolate(
                logits, size=(size, size), mode='bilinear',
                align_corners=False)
        pred = logits.argmax(1)[0].numpy()
        for c in (0, 1):
            tp = int(((pred == c) & (gt == c)).sum())
            inter[c] += tp
            den[c] += int((pred == c).sum()) + int((gt == c).sum())
            iou_den[c] += int(((pred == c) | (gt == c)).sum())
    dice = (2 * inter / np.maximum(den, 1)).mean()
    iou = (inter / np.maximum(iou_den, 1)).mean()
    return {'mDice': float(dice), 'mIoU': float(iou)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--size', type=int, default=256)
    ap.add_argument('--train-imgs', type=int, default=32)
    ap.add_argument('--test-imgs', type=int, default=8)
    ap.add_argument('--epochs', type=int, default=12)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--out', default='PARITY_PSPNET.json')
    ap.add_argument('--platform', default='')
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update('jax_platforms', args.platform)

    work = tempfile.mkdtemp(prefix='parity_pspnet_')
    data_root = os.path.join(work, 'ds')
    build_learnable_kits(data_root, args.train_imgs, args.test_imgs,
                         args.size)
    result = dict(model='pspnet_r50-d8', size=args.size,
                  epochs=args.epochs, batch=args.batch)

    cfg_path = os.path.join(work, 'cfg.py')
    wd = os.path.join(work, 'wd')
    write_cfg(cfg_path, data_root, args.epochs, args.batch, args.size)
    _sys.argv = ['tools/train.py', cfg_path, '--work-dir', wd,
                 '--no-validate', '--seed', '0']
    print('== training pspnet ==', flush=True)
    runpy.run_path(os.path.join(_repo, 'tools', 'train.py'),
                   run_name='__main__')
    result['ckpt'] = os.path.join(wd, 'latest.ckpt')

    json_dir = os.path.join(work, 'metrics')
    _sys.argv = ['tools/test.py', f'{data_root}/test/images', cfg_path,
                 result['ckpt'], '--eval', 'mIoU', 'mDice',
                 '--work-dir', json_dir]
    runpy.run_path(os.path.join(_repo, 'tools', 'test.py'),
                   run_name='__main__')
    metric_files = sorted(os.listdir(json_dir))
    with open(os.path.join(json_dir, metric_files[-1])) as f:
        jax_metrics = json.load(f)['metric']
    result['jax'] = {k: float(jax_metrics[k]) for k in ('mIoU', 'mDice')}

    from stc_unet_tpu.engine.checkpoint import load_checkpoint_file
    blob = load_checkpoint_file(result['ckpt'])
    result['torch'] = torch_eval(blob['variables'], data_root,
                                 args.test_imgs, args.size)
    result['abs_delta'] = {
        k: abs(result['jax'][k] - result['torch'][k])
        for k in ('mIoU', 'mDice')}
    result['trained_above_0p9_dice'] = result['jax']['mDice'] > 0.9
    result['parity_within_0p1pct'] = all(
        d <= 1e-3 for d in result['abs_delta'].values())
    with open(args.out, 'w') as f:
        json.dump(result, f, indent=2)
        f.write('\n')
    print(json.dumps(result, indent=2))
    assert result['trained_above_0p9_dice'], 'failed to train to 0.9 Dice'
    assert result['parity_within_0p1pct'], 'trained parity > 0.1%!'


if __name__ == '__main__':
    main()
