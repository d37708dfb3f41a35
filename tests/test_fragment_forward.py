"""Forward-smoke every ``configs/_base_/models/*.py`` fragment
(≙ reference model-zoo coverage: each architecture family must not just
*build* but *run* ``simple_test`` end to end).

Slow (builds + jits ~48 models on CPU) — marked ``slow``; deselect with
``-m 'not slow'`` for quick runs.
"""
import glob
import os.path as osp

import numpy as np
import pytest

from stc_unet_tpu.models import build_segmentor
from stc_unet_tpu.utils import Config

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
FRAGMENTS = sorted(glob.glob(osp.join(REPO, 'configs', '_base_', 'models',
                                      '*.py')))


def test_fragments_found():
    assert len(FRAGMENTS) > 40


@pytest.mark.slow
@pytest.mark.parametrize('cfg_file', FRAGMENTS,
                         ids=[osp.basename(c) for c in FRAGMENTS])
def test_fragment_forward(cfg_file):
    cfg = Config.fromfile(cfg_file)
    # zoo fragments point at mmlab's ./pretrain/*.pth download convention;
    # the strict loader (FileNotFoundError on missing local paths) is the
    # behavior under test elsewhere — here we smoke the architecture only
    if cfg.model.get('backbone', {}).get('pretrained'):
        cfg.model.backbone.pretrained = None
    if cfg.model.get('pretrained'):
        cfg.model.pretrained = None
    init_cfg = cfg.model.get('backbone', {}).get('init_cfg')
    if isinstance(init_cfg, dict) and init_cfg.get('type') == 'Pretrained':
        cfg.model.backbone.init_cfg = None
    if 'test_cfg' in cfg.model:
        model = build_segmentor(cfg.model)
    else:
        model = build_segmentor(
            cfg.model,
            test_cfg=cfg.get('test_cfg') or dict(mode='whole'))
    model.init_weights(seed=0, input_size=(64, 64))
    img = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    metas = [dict(ori_shape=(64, 64, 3), img_shape=(64, 64, 3),
                  pad_shape=(64, 64, 3), scale_factor=1.0, flip=False)]
    pred = model.simple_test(img, metas)
    assert pred[0].shape == (64, 64)
    # train path: every fragment must also produce finite losses
    gt = np.random.RandomState(1).randint(
        0, max(model.num_classes, 2), (1, 64, 64)).astype(np.int32)
    losses = model.forward_train(img, metas, gt)
    total = sum(float(np.asarray(v).mean())
                for k, v in losses.items() if 'loss' in k)
    assert np.isfinite(total)
