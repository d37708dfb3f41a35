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
    train = cfg.data.train
    # list-form train = implicit ConcatDataset (e.g. occlude_face zoo cfg)
    train_cfgs = train if isinstance(train, (list, tuple)) else [train]
    for tc in train_cfgs:
        train_pipeline = tc.get('pipeline') or \
            tc.get('dataset', {}).get('pipeline')
        assert train_pipeline is not None
        Compose(train_pipeline)
    # occlude_face zoo cfg ships train+val only — no test split
    eval_split = cfg.data.get('test') or cfg.data.get('val')
    Compose(eval_split['pipeline'])
