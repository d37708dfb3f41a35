"""Config-zoo smoke test (≙ reference ``tests/test_config.py:27-50``):
every config under configs/ and my_config/ must load and build its
segmentor; train pipelines must compose."""
import glob
import os.path as osp

import pytest

from stc_unet_tpu.datasets.pipelines import Compose
from stc_unet_tpu.models import build_segmentor
from stc_unet_tpu.utils import Config

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _all_configs():
    files = sorted(
        glob.glob(osp.join(REPO, 'configs', '*', '*.py')) +
        glob.glob(osp.join(REPO, 'my_config', '*.py')))
    return [f for f in files
            if not osp.basename(f).startswith('_base')
            and '_base_' not in f]


CONFIGS = _all_configs()


def test_configs_found():
    assert len(CONFIGS) > 40


@pytest.mark.parametrize('cfg_file', CONFIGS,
                         ids=[osp.basename(c) for c in CONFIGS])
def test_config_build_segmentor(cfg_file):
    cfg = Config.fromfile(cfg_file)
    assert 'model' in cfg
    model = build_segmentor(cfg.model, test_cfg=cfg.get('test_cfg'))
    assert model.with_decode_head


@pytest.mark.parametrize('cfg_file', CONFIGS,
                         ids=[osp.basename(c) for c in CONFIGS])
def test_config_data_pipeline_composes(cfg_file):
    cfg = Config.fromfile(cfg_file)
    if 'data' not in cfg:
        pytest.skip('no data section')
    train_pipeline = cfg.data.train.get('pipeline') or \
        cfg.data.train.get('dataset', {}).get('pipeline')
    assert train_pipeline is not None
    Compose(train_pipeline)
    Compose(cfg.data.test['pipeline'])
