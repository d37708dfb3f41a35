from stc_unet_tpu.utils import get_root_logger

from .inference import inference_segmentor, init_segmentor, show_result_pyplot
from .test import multi_gpu_test, np2tmp, single_gpu_test
from .train import (init_random_seed, set_random_seed, train_segmentor)

__all__ = [
    'inference_segmentor', 'init_segmentor', 'show_result_pyplot',
    'multi_gpu_test', 'np2tmp', 'single_gpu_test', 'init_random_seed',
    'set_random_seed', 'train_segmentor', 'get_root_logger'
]
