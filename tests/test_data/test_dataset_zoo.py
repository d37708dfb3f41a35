"""Dataset-zoo contract tests: every registered dataset class instantiates
on a synthetic directory and carries consistent CLASSES/PALETTE and suffix
metadata (≙ the reference's per-dataset test files under
``tests/test_data``)."""
import os

import numpy as np
import pytest
from PIL import Image

from stc_unet_tpu.datasets.builder import DATASETS, build_dataset

PIPELINE = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations'),
]

# wrappers and bases excluded: they compose datasets rather than bind data
ZOO = sorted(n for n in DATASETS._module_dict
             if n not in ('ConcatDataset', 'RepeatDataset',
                          'MultiImageMixDataset', 'CustomDataset'))


@pytest.fixture(scope='module')
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('zoo_data')
    os.makedirs(root / 'imgs', exist_ok=True)
    os.makedirs(root / 'anns', exist_ok=True)
    rng = np.random.RandomState(0)
    # cover the common suffixes the zoo classes declare
    for stem in ('a', 'b'):
        for suffix in ('.png', '.jpg', '.tif', '_leftImg8bit.png'):
            Image.fromarray(rng.randint(0, 255, (16, 16, 3),
                                        dtype=np.uint8)).save(
                root / 'imgs' / f'{stem}{suffix}')
        for suffix in ('.png', '_gtFine_labelTrainIds.png',
                       '_manual1.png', '_1stHO.png', '_labelTrainIds.png',
                       '_instanceTrainIds.png', '_gt.tif'):
            Image.fromarray(rng.randint(0, 2, (16, 16)).astype(
                np.uint8)).save(root / 'anns' / f'{stem}{suffix}')
    return str(root)


# these require a split file (reference signature: positional split)
NEEDS_SPLIT = {'FaceOccludedDataset', 'PascalContextDataset',
               'PascalContextDataset59', 'PascalVOCDataset'}


def test_zoo_is_nonempty():
    assert len(ZOO) >= 18


@pytest.mark.parametrize('name', ZOO)
def test_dataset_builds_and_metadata_consistent(name, data_root, tmp_path):
    kwargs = {}
    if name in NEEDS_SPLIT:
        split = tmp_path / 'split.txt'
        split.write_text('a\nb\n')
        kwargs['split'] = str(split)
    ds = build_dataset(dict(type=name, data_root=data_root, img_dir='imgs',
                            ann_dir='anns', pipeline=list(PIPELINE),
                            **kwargs))
    if ds.CLASSES is not None and ds.PALETTE is not None:
        assert len(ds.CLASSES) == len(ds.PALETTE), name
        assert all(len(c) == 3 for c in ds.PALETTE), name
    assert isinstance(ds.img_suffix, str)
    # file discovery ran without error; count is suffix-dependent
    assert len(ds) >= 0
