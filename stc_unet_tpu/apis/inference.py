"""Inference APIs (≙ reference ``mmseg/apis/inference.py:12,70,106``)."""
from __future__ import annotations

import warnings
from typing import Optional, Union

import numpy as np

from stc_unet_tpu.datasets import collate
from stc_unet_tpu.datasets.pipelines import Compose
from stc_unet_tpu.models import build_segmentor
from stc_unet_tpu.utils import Config


def init_segmentor(config, checkpoint: Optional[str] = None, device=None):
    """Build a segmentor from config (+ checkpoint)
    (reference ``inference.py:12``). ``device`` accepted for parity; jax
    places arrays on the default backend."""
    if isinstance(config, str):
        config = Config.fromfile(config)
    elif not isinstance(config, Config):
        raise TypeError(
            f'config must be a filename or Config object, but got '
            f'{type(config)}')
    config.model.pretrained = None
    config.model.train_cfg = None
    model = build_segmentor(config.model, test_cfg=config.get('test_cfg'))
    if checkpoint is not None:
        from stc_unet_tpu.engine import load_checkpoint
        ckpt = load_checkpoint(model, checkpoint)
        meta = ckpt.get('meta', {})
        if 'CLASSES' in meta:
            model.CLASSES = tuple(meta['CLASSES'])
        else:
            warnings.warn('CLASSES is not saved in the checkpoint meta')
            from stc_unet_tpu.core import get_classes
            model.CLASSES = get_classes('cityscapes')
        if 'PALETTE' in meta:
            model.PALETTE = meta['PALETTE']
    else:
        model.init_weights()
    model.cfg = config
    return model


def inference_segmentor(model, imgs):
    """Run test-pipeline inference on image path(s)/array(s)
    (reference ``inference.py:70``)."""
    cfg = model.cfg
    # drop the file-loading step; LoadImage accepts arrays and paths
    test_pipeline = [dict(type='LoadImage')] + [
        dict(t) for t in cfg.data.test.pipeline[1:]]
    pipeline = Compose(test_pipeline)
    is_batch = True
    if not isinstance(imgs, (list, tuple)):
        imgs = [imgs]
        is_batch = False
    samples = [pipeline(dict(img=img)) for img in imgs]
    data = collate(samples)
    from .test import _as_test_kwargs
    results = model(return_loss=False, rescale=True, **_as_test_kwargs(data))
    if not is_batch:
        return results
    return results


def show_result_pyplot(model, img, result, palette=None, fig_size=(15, 10),
                       opacity=0.5, title='', block=True, out_file=None):
    """Matplotlib visualization (reference ``inference.py:106``)."""
    if hasattr(model, 'module'):
        model = model.module
    img = model.show_result(img, result, palette=palette, show=False,
                            opacity=opacity)
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    plt.figure(figsize=fig_size)
    plt.imshow(np.asarray(img)[..., ::-1])
    plt.title(title)
    plt.tight_layout()
    if out_file is not None:
        plt.savefig(out_file)
    plt.close()
    return img
