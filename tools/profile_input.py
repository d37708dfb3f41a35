#!/usr/bin/env python
"""Input-pipeline timing probe: data_time through the real train CLI.

Round-3 found training input-bound on the 1-CPU host (data_time 0.62
s/batch vs a 0.36 s train step with ``device_pipeline=True``; the
remainder attributed to PNG decode). This probe measures the decode-once
image cache (``data.img_cache``, `datasets/pipelines/img_cache.py`)
against that: it trains full-size STC-UNet on the learnable pseudo-KiTS
fixture through ``tools/train.py`` under each input configuration and
reports the logged ``data_time`` (mmcv IterTimer semantics: wall time
spent waiting for the next batch).

All configurations run in ONE process so the jitted train step compiles
once. Run on the real chip — data_time depends on how much prefetch
overlaps the device step, so CPU-platform numbers are not comparable.

    python tools/profile_input.py --epochs 6
"""
import argparse
import json
import os
import os.path as _osp
import runpy
import sys as _sys
import tempfile

_repo = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
_sys.path.insert(0, _repo)
_sys.path.insert(0, _osp.dirname(_osp.abspath(__file__)))

from parity_trained import build_learnable_kits, mean_data_time  # noqa: E402

CONFIGS = [
    # (tag, device_pipeline, img_cache)
    ('host', False, None),
    ('host_diskcache', False, 'disk'),
    ('device', True, None),
    ('device_diskcache', True, 'disk'),
    ('device_ramcache', True, 'ram'),
]


def write_cfg(path, data_root, epochs, batch, device_pipeline, img_cache,
              cache_dir, log_interval=1):
    extra = ''
    if img_cache:
        extra = (f'img_cache={img_cache!r}, '
                 f'img_cache_dir={cache_dir!r},')
    cfg = f'''
_base_ = [{_osp.join(_repo, 'my_config', 'STC-UNet.py')!r}]
data = dict(samples_per_gpu={batch}, workers_per_gpu=2,
            device_pipeline={device_pipeline}, {extra}
            train=dict(data_root={data_root!r}),
            val=dict(data_root={data_root!r}),
            test=dict(data_root={data_root!r}))
optimizer = dict(type='Adam', lr=3e-4, betas=(0.9, 0.999))
runner = dict(type='EpochBasedRunner', max_epochs={epochs})
checkpoint_config = dict(by_epoch=True, interval={epochs + 1},
                         save_optimizer=False)
evaluation = dict(interval={epochs + 1}, metric=['mDice'])
log_config = dict(interval={log_interval}, hooks=[dict(type='TextLoggerHook')])
bf16 = True
'''
    with open(path, 'w') as f:
        f.write(cfg)


def mean_step_time(log_dir):
    logs = sorted(f for f in os.listdir(log_dir) if f.endswith('.log.json'))
    if not logs:
        raise RuntimeError(f'no .log.json in {log_dir}')
    times = []
    with open(os.path.join(log_dir, logs[-1])) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if rec.get('mode') == 'train' and 'time' in rec:
                times.append(float(rec['time']))
    tail = times[max(2, len(times) // 4):]
    if not tail:
        raise RuntimeError(
            f'no train time records in {logs[-1]} — log interval larger '
            'than iters/epoch? raise --train-imgs or lower --log-interval')
    return sum(tail) / len(tail)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--size', type=int, default=512)
    ap.add_argument('--train-imgs', type=int, default=32)
    ap.add_argument('--epochs', type=int, default=6)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--out', default='')
    ap.add_argument('--log-interval', type=int, default=1,
                    help='TextLoggerHook interval; 1 pays a log readback '
                         'every step, 50 is the realistic default')
    ap.add_argument('--configs', default='',
                    help='comma-separated tag filter (default: all)')
    ap.add_argument('--platform', default='',
                    help="'' = default (TPU when present); 'cpu' for smoke")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update('jax_platforms', args.platform)

    work = tempfile.mkdtemp(prefix='profile_input_')
    data_root = os.path.join(work, 'ds')
    build_learnable_kits(data_root, args.train_imgs, 2, args.size)
    result = dict(size=args.size, batch=args.batch, epochs=args.epochs)

    only = [t for t in args.configs.split(',') if t]
    for tag, devpipe, cache in CONFIGS:
        if only and tag not in only:
            continue
        cfg_path = os.path.join(work, f'cfg_{tag}.py')
        wd = os.path.join(work, f'wd_{tag}')
        cache_dir = os.path.join(work, f'cache_{tag}')
        write_cfg(cfg_path, data_root, args.epochs, args.batch, devpipe,
                  cache, cache_dir, log_interval=args.log_interval)
        _sys.argv = ['tools/train.py', cfg_path, '--work-dir', wd,
                     '--no-validate', '--seed', '0']
        print(f'== training ({tag}) ==', flush=True)
        runpy.run_path(_osp.join(_repo, 'tools', 'train.py'),
                       run_name='__main__')
        result[f'data_time_{tag}_s'] = round(mean_data_time(wd), 4)
        result[f'step_time_{tag}_s'] = round(mean_step_time(wd), 4)
        print(json.dumps(result), flush=True)

    out = json.dumps(result, indent=1)
    print(out)
    if args.out:
        with open(args.out, 'w') as f:
            f.write(out + '\n')


if __name__ == '__main__':
    main()
