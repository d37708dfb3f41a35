"""Process environment setup (≙ reference ``mmseg/utils/set_env.py:11``)."""
from __future__ import annotations

import os
import platform
import warnings


def setup_multi_processes(cfg):
    """Cap host-side thread pools for the data loader (the reference caps
    OMP/MKL/cv2 threads so torch workers don't oversubscribe; here the
    motivation is identical for the thread-pool loader + XLA host threads).
    """
    if platform.system() != 'Windows':
        workers_per_gpu = cfg.get('data', {}).get('workers_per_gpu', 1)
        if 'OMP_NUM_THREADS' not in os.environ and workers_per_gpu > 1:
            os.environ['OMP_NUM_THREADS'] = '1'
        if 'MKL_NUM_THREADS' not in os.environ and workers_per_gpu > 1:
            os.environ['MKL_NUM_THREADS'] = '1'
    try:
        import cv2
        cv2.setNumThreads(int(os.environ.get('OPENCV_NUM_THREADS', 0)))
    except ImportError:
        pass
