"""Training-log analysis (≙ reference ``tools/analyze_logs.py``): plot metric
curves from the runner's ``.log.json`` files or print timing stats."""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse
import json
from collections import defaultdict

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description='Analyze json train logs')
    subparsers = parser.add_subparsers(dest='task')
    p_curve = subparsers.add_parser('plot_curve')
    p_curve.add_argument('json_logs', type=str, nargs='+')
    p_curve.add_argument('--keys', type=str, nargs='+', default=['mIoU'])
    p_curve.add_argument('--legend', type=str, nargs='+', default=None)
    p_curve.add_argument('--backend', type=str, default=None)
    p_curve.add_argument('--style', type=str, default='whitegrid')
    p_curve.add_argument('--out', type=str, default=None)
    p_curve.add_argument('--title', type=str, default=None)
    p_time = subparsers.add_parser('cal_train_time')
    p_time.add_argument('json_logs', type=str, nargs='+')
    p_time.add_argument('--include-outliers', action='store_true')
    return parser.parse_args()


def load_json_logs(json_logs):
    log_dicts = []
    for path in json_logs:
        log = defaultdict(list)
        with open(path) as f:
            for line in f:
                rec = json.loads(line.strip())
                for k, v in rec.items():
                    log[k].append(v)
        log_dicts.append(dict(log))
    return log_dicts


def cal_train_time(log_dicts, args):
    for i, log in enumerate(log_dicts):
        print(f'{"-" * 5}Analyze train time of {args.json_logs[i]}{"-" * 5}')
        times = np.array([t for t, m in zip(log.get('time', []),
                                            log.get('mode', []))
                          if m == 'train'])
        if not args.include_outliers and len(times) > 1:
            times = times[1:]
        if len(times) == 0:
            print('no timing records')
            continue
        print(f'average iter time: {np.mean(times):.4f} s/iter')
        print(f'slowest iter time: {np.max(times):.4f}')
        print(f'fastest iter time: {np.min(times):.4f}')
        print(f'time std over iters: {np.std(times):.4f}')


def plot_curve(log_dicts, args):
    import matplotlib
    matplotlib.use(args.backend or 'Agg')
    import matplotlib.pyplot as plt
    legend = args.legend or [
        f'{json_log}_{key}' for json_log in args.json_logs
        for key in args.keys]
    for i, log in enumerate(log_dicts):
        for j, key in enumerate(args.keys):
            xs, ys = [], []
            for it, mode in zip(log.get('iter', []),
                                log.get('mode', [''] * len(log.get(
                                    'iter', [])))):
                pass
            records = list(zip(log.get('iter', []),
                               log.get(key, [None] * len(
                                   log.get('iter', [])))))
            for it, val in records:
                if val is not None:
                    xs.append(it)
                    ys.append(val)
            if xs:
                plt.plot(xs, ys, label=legend[i * len(args.keys) + j],
                         marker='o' if key != 'loss' else None)
    plt.legend()
    plt.xlabel('iter')
    if args.title:
        plt.title(args.title)
    if args.out is None:
        plt.show()
    else:
        plt.savefig(args.out)
        print(f'saved curve to {args.out}')
    plt.close()


def main():
    args = parse_args()
    log_dicts = load_json_logs(args.json_logs)
    if args.task == 'cal_train_time':
        cal_train_time(log_dicts, args)
    else:
        plot_curve(log_dicts, args)


if __name__ == '__main__':
    main()
