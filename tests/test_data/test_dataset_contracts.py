"""Dataset zoo + wrapper behavioral contracts.

Mirrors the reference ``tests/test_data/test_dataset.py`` (851 LoC) test by
test: class/palette tables, classes-from-file, wrapper index arithmetic,
MultiImageMixDataset, the full CustomDataset evaluate protocol, concat
evaluation (separate and aggregated), submission formatting for
ADE/Cityscapes/LoveDA, and classes/palette overrides.
"""
import os.path as osp
from typing import Generator
from unittest.mock import MagicMock, patch

import numpy as np
import pytest
from PIL import Image

from stc_unet_tpu.core import get_classes, get_palette
from stc_unet_tpu.datasets import (DATASETS, ADE20KDataset, CityscapesDataset,
                                   COCOStuffDataset, ConcatDataset,
                                   CustomDataset, ISPRSDataset, LoveDADataset,
                                   MultiImageMixDataset, PascalVOCDataset,
                                   PotsdamDataset, RepeatDataset,
                                   build_dataset, iSAIDDataset)

IMG_NORM = dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375],
                to_rgb=True)
CROP = (40, 60)
TRAIN_PIPELINE = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations'),
    dict(type='Resize', img_scale=(24, 48), ratio_range=(0.5, 2.0)),
    dict(type='RandomCrop', crop_size=CROP, cat_max_ratio=0.75),
    dict(type='RandomFlip', prob=0.5),
    dict(type='PhotoMetricDistortion'),
    dict(type='Normalize', **IMG_NORM),
    dict(type='Pad', size=CROP, pad_val=0, seg_pad_val=255),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect', keys=['img', 'gt_semantic_seg']),
]
TEST_PIPELINE = [
    dict(type='LoadImageFromFile'),
    dict(type='MultiScaleFlipAug',
         img_scale=(24, 48),
         flip=False,
         transforms=[
             dict(type='Resize', keep_ratio=True),
             dict(type='RandomFlip'),
             dict(type='Normalize', **IMG_NORM),
             dict(type='ImageToTensor', keys=['img']),
             dict(type='Collect', keys=['img']),
         ]),
]


@pytest.fixture(scope='module')
def pseudo_dir(tmp_path_factory):
    """5 images ``{i}img.jpg`` + gts ``{i}gt.png`` + a 4-entry split file
    (≙ reference ``tests/data/pseudo_dataset``)."""
    root = tmp_path_factory.mktemp('pseudo_dataset')
    rng = np.random.RandomState(0)
    (root / 'imgs').mkdir()
    (root / 'gts').mkdir()
    (root / 'splits').mkdir()
    for i in range(5):
        img = rng.randint(0, 255, (10, 12, 3), dtype=np.uint8)
        gt = rng.randint(0, 7, (10, 12)).astype(np.uint8)
        Image.fromarray(img).save(root / 'imgs' / f'{i}img.jpg')
        Image.fromarray(gt).save(root / 'gts' / f'{i}gt.png')
    (root / 'splits' / 'train.txt').write_text(
        '\n'.join(str(i) for i in range(4)) + '\n')
    return str(root)


@pytest.fixture(scope='module')
def cityscapes_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp('pseudo_cityscapes')
    img_dir = root / 'leftImg8bit' / 'val' / 'frankfurt'
    ann_dir = root / 'gtFine' / 'val' / 'frankfurt'
    img_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    rng = np.random.RandomState(1)
    Image.fromarray(rng.randint(0, 255, (16, 16, 3), dtype=np.uint8)).save(
        img_dir / 'frankfurt_000000_000294_leftImg8bit.png')
    # the fork's default seg_map_suffix is '_gtFine_labelIds.png'
    # (reference cityscapes.py:32)
    Image.fromarray(rng.randint(0, 19, (16, 16)).astype(np.uint8)).save(
        ann_dir / 'frankfurt_000000_000294_gtFine_labelIds.png')
    return str(root)


def _make_png_dataset(tmp_path_factory, name, n, ann_suffix=''):
    root = tmp_path_factory.mktemp(name)
    (root / 'img_dir').mkdir()
    (root / 'ann_dir').mkdir()
    rng = np.random.RandomState(2)
    for i in range(n):
        Image.fromarray(rng.randint(0, 255, (8, 8, 3), dtype=np.uint8)).save(
            root / 'img_dir' / f'P{i:04d}.png')
        Image.fromarray(rng.randint(0, 5, (8, 8)).astype(np.uint8)).save(
            root / 'ann_dir' / f'P{i:04d}{ann_suffix}.png')
    return root


def test_zoo_classes_tables():
    assert list(CityscapesDataset.CLASSES) == get_classes('cityscapes')
    assert list(PascalVOCDataset.CLASSES) == get_classes('voc') == get_classes(
        'pascal_voc')
    assert list(
        ADE20KDataset.CLASSES) == get_classes('ade') == get_classes('ade20k')
    assert list(COCOStuffDataset.CLASSES) == get_classes('cocostuff')
    assert list(LoveDADataset.CLASSES) == get_classes('loveda')
    assert list(PotsdamDataset.CLASSES) == get_classes('potsdam')
    assert list(ISPRSDataset.CLASSES) == get_classes('vaihingen')
    assert list(iSAIDDataset.CLASSES) == get_classes('isaid')
    with pytest.raises(ValueError):
        get_classes('unsupported')


def test_zoo_palette_tables():
    # fork quirk: the class attr is the grayscale train-id ramp while the
    # table keeps the official colors (reference cityscapes.py:26-28)
    assert CityscapesDataset.PALETTE == [[i, i, i] for i in range(19)]
    assert len(get_palette('cityscapes')) == 19
    assert list(PascalVOCDataset.PALETTE) == get_palette('voc') == get_palette(
        'pascal_voc')
    assert list(
        ADE20KDataset.PALETTE) == get_palette('ade') == get_palette('ade20k')
    assert list(LoveDADataset.PALETTE) == get_palette('loveda')
    assert list(PotsdamDataset.PALETTE) == get_palette('potsdam')
    assert list(COCOStuffDataset.PALETTE) == get_palette('cocostuff')
    assert list(iSAIDDataset.PALETTE) == get_palette('isaid')
    with pytest.raises(ValueError):
        get_palette('unsupported')


def test_classes_from_file(tmp_path):
    classes_path = str(tmp_path / 'classes.txt')
    empty_img_dir = str(tmp_path / 'empty')
    import os
    os.makedirs(empty_img_dir)
    kwargs = dict(pipeline=[dict(type='LoadImageFromFile')],
                  img_dir=empty_img_dir, classes=classes_path)

    categories = get_classes('cityscapes')
    with open(classes_path, 'w') as f:
        f.write('\n'.join(categories))
    assert list(CityscapesDataset(**kwargs).CLASSES) == categories

    categories = ['road', 'sidewalk', 'building']
    with open(classes_path, 'w') as f:
        f.write('\n'.join(categories))
    assert list(CityscapesDataset(**kwargs).CLASSES) == categories

    categories = ['road', 'sidewalk', 'unknown']
    with open(classes_path, 'w') as f:
        f.write('\n'.join(categories))
    with pytest.raises(ValueError):
        CityscapesDataset(**kwargs)


@patch.object(CustomDataset, 'load_annotations', MagicMock())
@patch.object(CustomDataset, '__getitem__',
              MagicMock(side_effect=lambda idx: idx))
def test_wrapper_index_arithmetic():
    dataset_a = CustomDataset(img_dir=MagicMock(), pipeline=[])
    dataset_a.img_infos = MagicMock()
    dataset_a.img_infos.__len__.return_value = 10
    dataset_b = CustomDataset(img_dir=MagicMock(), pipeline=[])
    dataset_b.img_infos = MagicMock()
    dataset_b.img_infos.__len__.return_value = 20

    concat_dataset = ConcatDataset([dataset_a, dataset_b])
    assert concat_dataset[5] == 5
    assert concat_dataset[25] == 15
    assert len(concat_dataset) == len(dataset_a) + len(dataset_b)
    # negative indices wrap; overflowing negatives raise
    assert concat_dataset[-1] == 19
    with pytest.raises(ValueError):
        concat_dataset[-31]

    repeat_dataset = RepeatDataset(dataset_a, 10)
    assert repeat_dataset[5] == 5
    assert repeat_dataset[15] == 5
    assert repeat_dataset[27] == 7
    assert len(repeat_dataset) == 10 * len(dataset_a)


def test_multi_image_mix_dataset():
    img_scale = (60, 60)
    pipeline = [
        dict(type='RandomMosaic', prob=1, img_scale=img_scale),
        dict(type='RandomFlip', prob=0.5),
        dict(type='Resize', img_scale=img_scale, keep_ratio=False),
    ]
    rng = np.random.RandomState(3)
    results = []
    for _ in range(2):
        h, w = rng.randint(10, 30), rng.randint(10, 30)
        results.append(dict(
            gt_semantic_seg=rng.randint(5, size=(h, w)),
            img=np.ones((h, w, 3)),
            seg_fields=['gt_semantic_seg']))

    classes = ['0', '1', '2', '3', '4']
    palette = [(0, 0, 0), (1, 1, 1), (2, 2, 2), (3, 3, 3), (4, 4, 4)]
    with patch.object(CustomDataset, 'load_annotations', MagicMock()), \
            patch.object(CustomDataset, '__getitem__',
                         MagicMock(side_effect=lambda idx: results[idx])):
        dataset_a = CustomDataset(img_dir=MagicMock(), pipeline=[],
                                  test_mode=True, classes=classes,
                                  palette=palette)
        dataset_a.img_infos = MagicMock()
        dataset_a.img_infos.__len__.return_value = 2

        mix_dataset = MultiImageMixDataset(dataset_a, pipeline)
        assert len(mix_dataset) == len(dataset_a)
        for idx in range(len(dataset_a)):
            mix_dataset[idx]

        # skip RandomFlip only: mosaic+resize land exactly on img_scale
        mix_dataset = MultiImageMixDataset(
            dataset_a, pipeline, skip_type_keys=('RandomFlip',))
        for idx in range(len(dataset_a)):
            out = mix_dataset[idx]
            assert out['img'].shape == (img_scale[0], img_scale[1], 3)

        mix_dataset.update_skip_type_keys(('RandomFlip', 'Resize'))
        for idx in range(len(dataset_a)):
            out = mix_dataset[idx]
            assert out['img'].shape[:2] != img_scale

        with pytest.raises(TypeError):
            MultiImageMixDataset(dataset_a, [['Resize']])


def test_custom_dataset_path_resolution(pseudo_dir):
    # data_root + relative dirs
    ds = CustomDataset(TRAIN_PIPELINE, data_root=pseudo_dir, img_dir='imgs/',
                       ann_dir='gts/', img_suffix='img.jpg',
                       seg_map_suffix='gt.png')
    assert len(ds) == 5
    # with split
    ds = CustomDataset(TRAIN_PIPELINE, data_root=pseudo_dir, img_dir='imgs/',
                       ann_dir='gts/', img_suffix='img.jpg',
                       seg_map_suffix='gt.png', split='splits/train.txt')
    assert len(ds) == 4
    # no data_root
    ds = CustomDataset(TRAIN_PIPELINE, img_dir=osp.join(pseudo_dir, 'imgs'),
                       ann_dir=osp.join(pseudo_dir, 'gts'),
                       img_suffix='img.jpg', seg_map_suffix='gt.png')
    assert len(ds) == 5
    # data_root plus absolute dirs: absolute wins
    ds = CustomDataset(TRAIN_PIPELINE, data_root=pseudo_dir,
                       img_dir=osp.abspath(osp.join(pseudo_dir, 'imgs')),
                       ann_dir=osp.abspath(osp.join(pseudo_dir, 'gts')),
                       img_suffix='img.jpg', seg_map_suffix='gt.png')
    assert len(ds) == 5


def test_custom_dataset_evaluate_protocol(pseudo_dir):
    train_dataset = CustomDataset(TRAIN_PIPELINE, data_root=pseudo_dir,
                                  img_dir='imgs/', ann_dir='gts/',
                                  img_suffix='img.jpg',
                                  seg_map_suffix='gt.png')
    test_dataset = CustomDataset(TEST_PIPELINE,
                                 img_dir=osp.join(pseudo_dir, 'imgs'),
                                 img_suffix='img.jpg', test_mode=True,
                                 classes=('pseudo_class', ))
    assert len(test_dataset) == 5

    assert isinstance(train_dataset[0], dict)
    assert isinstance(test_dataset[0], dict)

    gt_seg_maps = train_dataset.get_gt_seg_maps(efficient_test=True)
    assert isinstance(gt_seg_maps, Generator)
    gt_seg_maps = list(gt_seg_maps)
    assert len(gt_seg_maps) == 5

    # base class has no submission format
    with pytest.raises(NotImplementedError):
        test_dataset.format_results([], '')

    rng = np.random.RandomState(4)
    pseudo_results = [
        rng.randint(0, 7, size=m.shape) for m in gt_seg_maps]

    # evaluation without CLASSES is a TypeError
    for metric in (['mIoU'], 'mDice', ['mDice', 'mIoU']):
        with pytest.raises(TypeError):
            train_dataset.evaluate(pseudo_results, metric=metric)

    train_dataset.CLASSES = tuple(['a'] * 7)
    res = train_dataset.evaluate(pseudo_results, metric='mIoU')
    assert {'mIoU', 'mAcc', 'aAcc'} <= set(res)
    res = train_dataset.evaluate(pseudo_results, metric='mDice')
    assert {'mDice', 'mAcc', 'aAcc'} <= set(res)
    res = train_dataset.evaluate(pseudo_results, metric='mFscore')
    assert {'mRecall', 'mPrecision', 'mFscore', 'aAcc'} <= set(res)
    res = train_dataset.evaluate(pseudo_results,
                                 metric=['mIoU', 'mDice', 'mFscore'])
    for key in ('mIoU', 'mDice', 'mAcc', 'aAcc', 'mFscore', 'mPrecision',
                'mRecall'):
        assert key in res
        assert not np.isnan(res[key])

    # pre_eval path yields the same key surface
    pre_results = []
    for idx in range(len(train_dataset)):
        pred = rng.randint(0, 7, size=gt_seg_maps[idx].shape)
        pre_results.extend(train_dataset.pre_eval(pred, idx))
    res = train_dataset.evaluate(pre_results,
                                 metric=['mIoU', 'mDice', 'mFscore'])
    for key in ('mIoU', 'mDice', 'mAcc', 'aAcc', 'mFscore', 'mPrecision',
                'mRecall'):
        assert key in res
        assert not np.isnan(res[key])


@pytest.mark.parametrize('separate_eval', [True, False])
def test_eval_concat_custom_dataset(pseudo_dir, separate_eval):
    cfg1 = dict(type='CustomDataset', pipeline=TEST_PIPELINE,
                data_root=pseudo_dir, img_dir='imgs/', ann_dir='gts/',
                img_suffix='img.jpg', seg_map_suffix='gt.png',
                classes=tuple(['a'] * 7))
    dataset1 = build_dataset(cfg1)
    assert len(dataset1) == 5
    gt_seg_maps = list(dataset1.get_gt_seg_maps())

    rng = np.random.RandomState(5)
    pseudo_results = [
        rng.randint(0, 7, size=m.shape) for m in gt_seg_maps]
    eval_results1 = dataset1.evaluate(
        pseudo_results, metric=['mIoU', 'mDice', 'mFscore'])

    cfg2 = dict(cfg1, img_dir=['imgs/', 'imgs/'], ann_dir=['gts/', 'gts/'],
                separate_eval=separate_eval)
    dataset2 = build_dataset(cfg2)
    assert isinstance(dataset2, ConcatDataset)
    assert len(dataset2) == 10

    eval_results2 = dataset2.evaluate(
        pseudo_results * 2, metric=['mIoU', 'mDice', 'mFscore'])
    keys = ('mIoU', 'mDice', 'mAcc', 'aAcc', 'mFscore', 'mPrecision',
            'mRecall')
    if separate_eval:
        for k in keys:
            assert eval_results1[k] == eval_results2[f'0_{k}'] \
                == eval_results2[f'1_{k}']
    else:
        for k in keys:
            assert eval_results1[k] == eval_results2[k]

    # index arithmetic incl. negatives
    assert dataset2.get_dataset_idx_and_sample_idx(3) == (0, 3)
    assert dataset2.get_dataset_idx_and_sample_idx(7) == (1, 2)
    assert dataset2.get_dataset_idx_and_sample_idx(-7) == (0, 3)
    with pytest.raises(ValueError):
        dataset2.get_dataset_idx_and_sample_idx(-11)
    assert dataset2.get_dataset_idx_and_sample_idx(-6) == \
        dataset2.get_dataset_idx_and_sample_idx(len(dataset2) - 6)

    # pre_eval 4-tuples of arrays
    pre1, preds = [], []
    for idx in range(len(dataset1)):
        pred = rng.randint(0, 7, size=gt_seg_maps[idx].shape)
        preds.append(pred)
        pre1.extend(dataset1.pre_eval(pred, idx))
    assert len(pre1) == len(dataset1)
    assert isinstance(pre1[0], tuple) and len(pre1[0]) == 4
    assert isinstance(np.asarray(pre1[0][0]), np.ndarray)
    eval_results1 = dataset1.evaluate(pre1,
                                      metric=['mIoU', 'mDice', 'mFscore'])

    preds = preds * 2
    pre2 = []
    for idx in range(len(dataset2)):
        pre2.extend(dataset2.pre_eval(preds[idx], idx))
    assert len(pre2) == len(dataset2)
    eval_results2 = dataset2.evaluate(pre2,
                                      metric=['mIoU', 'mDice', 'mFscore'])
    if separate_eval:
        for k in keys:
            assert eval_results1[k] == eval_results2[f'0_{k}'] \
                == eval_results2[f'1_{k}']
    else:
        for k in keys:
            assert eval_results1[k] == eval_results2[k]

    # batch-indices pre_eval
    pre2 = dataset2.pre_eval(preds, list(range(len(preds))))
    assert len(pre2) == len(dataset2)
    eval_results2 = dataset2.evaluate(pre2,
                                      metric=['mIoU', 'mDice', 'mFscore'])
    if separate_eval:
        for k in keys:
            assert eval_results1[k] == eval_results2[f'0_{k}']
    else:
        for k in keys:
            assert eval_results1[k] == eval_results2[k]


def test_ade_format_results(pseudo_dir, tmp_path):
    test_dataset = ADE20KDataset(
        pipeline=[], img_dir=osp.join(pseudo_dir, 'imgs'))
    assert len(test_dataset) == 5
    rng = np.random.RandomState(6)
    pseudo_results = [rng.randint(0, 7, size=(2, 2))
                      for _ in range(len(test_dataset))]
    file_paths = test_dataset.format_results(
        pseudo_results, str(tmp_path / 'format_ade'))
    assert len(file_paths) == len(test_dataset)
    # submission labels are written +1 (zero was reduced)
    temp = np.array(Image.open(file_paths[0]))
    assert np.allclose(temp, pseudo_results[0] + 1)


@pytest.mark.parametrize('separate_eval', [True, False])
def test_concat_ade_format(pseudo_dir, tmp_path, separate_eval):
    test_dataset = ADE20KDataset(
        pipeline=[], img_dir=osp.join(pseudo_dir, 'imgs'))
    concat_dataset = ConcatDataset([test_dataset, test_dataset],
                                   separate_eval=separate_eval)
    assert len(concat_dataset) == 10
    rng = np.random.RandomState(7)
    pseudo_results = [rng.randint(0, 7, size=(2, 2))
                      for _ in range(len(concat_dataset))]

    # per-image formatting via indices
    file_paths = []
    for i in range(len(pseudo_results)):
        file_paths.extend(concat_dataset.format_results(
            [pseudo_results[i]], str(tmp_path / 'fmt1'), indices=[i]))
    assert len(file_paths) == len(concat_dataset)
    temp = np.array(Image.open(file_paths[0]))
    assert np.allclose(temp, pseudo_results[0] + 1)

    # default indices
    file_paths = concat_dataset.format_results(pseudo_results,
                                               str(tmp_path / 'fmt2'))
    assert len(file_paths) == len(concat_dataset)
    temp = np.array(Image.open(file_paths[0]))
    assert np.allclose(temp, pseudo_results[0] + 1)


def test_cityscapes_dataset(cityscapes_dir, tmp_path):
    test_dataset = CityscapesDataset(
        pipeline=[],
        img_dir=osp.join(cityscapes_dir, 'leftImg8bit'),
        ann_dir=osp.join(cityscapes_dir, 'gtFine'))
    assert len(test_dataset) == 1
    gt_seg_maps = list(test_dataset.get_gt_seg_maps())

    rng = np.random.RandomState(8)
    pseudo_results = [rng.randint(0, 19, size=m.shape) for m in gt_seg_maps]
    file_paths = test_dataset.format_results(pseudo_results,
                                             str(tmp_path / 'format_city'))
    assert len(file_paths) == len(test_dataset)
    temp = np.array(Image.open(file_paths[0]))
    assert np.allclose(temp,
                       test_dataset._convert_to_label_id(pseudo_results[0]))

    # trainId→labelId spot checks against the public table
    conv = test_dataset._convert_to_label_id(
        np.array([[0, 1, 18], [255, 10, 13]]))
    assert conv.tolist() == [[7, 8, 33], [0, 23, 26]]

    # standard metrics work; the official protocol needs cityscapesscripts
    res = test_dataset.evaluate(pseudo_results, metric='mIoU')
    assert 'mIoU' in res
    with pytest.raises(ImportError):
        test_dataset.evaluate(pseudo_results, metric='cityscapes',
                              imgfile_prefix=str(tmp_path / 'fmt_eval'))


@pytest.mark.parametrize('separate_eval', [True, False])
def test_concat_cityscapes_unsupported(cityscapes_dir, pseudo_dir,
                                       separate_eval):
    cityscapes = CityscapesDataset(
        pipeline=[],
        img_dir=osp.join(cityscapes_dir, 'leftImg8bit'),
        ann_dir=osp.join(cityscapes_dir, 'gtFine'))
    with pytest.raises(NotImplementedError):
        ConcatDataset([cityscapes, cityscapes], separate_eval=separate_eval)
    ade = ADE20KDataset(pipeline=[], img_dir=osp.join(pseudo_dir, 'imgs'))
    with pytest.raises(NotImplementedError):
        ConcatDataset([cityscapes, ade], separate_eval=separate_eval)


def test_loveda_format_and_eval(tmp_path_factory, tmp_path):
    root = _make_png_dataset(tmp_path_factory, 'pseudo_loveda', 3)
    test_dataset = LoveDADataset(pipeline=[],
                                 img_dir=str(root / 'img_dir'),
                                 ann_dir=str(root / 'ann_dir'))
    assert len(test_dataset) == 3
    gt_seg_maps = list(test_dataset.get_gt_seg_maps())
    rng = np.random.RandomState(9)
    pseudo_results = [rng.randint(0, 7, size=m.shape) for m in gt_seg_maps]
    file_paths = test_dataset.format_results(pseudo_results,
                                             str(tmp_path / 'format_loveda'))
    assert len(file_paths) == len(test_dataset)
    test_dataset.evaluate(pseudo_results, metric='mIoU',
                          imgfile_prefix=str(tmp_path / 'format_loveda'))


def test_potsdam_vaihingen(tmp_path_factory):
    root = _make_png_dataset(tmp_path_factory, 'pseudo_potsdam', 1)
    assert len(PotsdamDataset(pipeline=[], img_dir=str(root / 'img_dir'),
                              ann_dir=str(root / 'ann_dir'))) == 1
    root = _make_png_dataset(tmp_path_factory, 'pseudo_vaihingen', 1)
    assert len(ISPRSDataset(pipeline=[], img_dir=str(root / 'img_dir'),
                            ann_dir=str(root / 'ann_dir'))) == 1


def test_isaid_split_and_suffix(tmp_path_factory):
    root = _make_png_dataset(tmp_path_factory, 'pseudo_isaid', 2,
                             ann_suffix='_instance_color_RGB')
    (root / 'splits').mkdir()
    (root / 'splits' / 'train.txt').write_text('P0000\n')
    ds = iSAIDDataset(pipeline=[], img_dir=str(root / 'img_dir'),
                      ann_dir=str(root / 'ann_dir'))
    assert len(ds) == 2
    assert ds.img_infos[0]['ann']['seg_map'].endswith(
        '_instance_color_RGB.png')
    infos = ds.load_annotations(img_dir=str(root / 'img_dir'),
                                img_suffix='.png',
                                ann_dir=str(root / 'ann_dir'),
                                seg_map_suffix='.png',
                                split=str(root / 'splits' / 'train.txt'))
    assert len(infos) == 1


@patch.object(CustomDataset, 'load_annotations', MagicMock())
@patch.object(CustomDataset, '__getitem__',
              MagicMock(side_effect=lambda idx: idx))
@pytest.mark.parametrize('dataset, classes', [
    ('ADE20KDataset', ('wall', 'building')),
    ('CityscapesDataset', ('road', 'sidewalk')),
    ('CustomDataset', ('bus', 'car')),
    ('PascalVOCDataset', ('aeroplane', 'bicycle')),
])
def test_custom_classes_override_default(dataset, classes):
    dataset_class = DATASETS.get(dataset)
    original_classes = dataset_class.CLASSES

    custom_dataset = dataset_class(
        pipeline=[], img_dir=MagicMock(), split=MagicMock(), classes=classes,
        test_mode=True)
    assert custom_dataset.CLASSES != original_classes
    assert custom_dataset.CLASSES == classes

    custom_dataset = dataset_class(
        pipeline=[], img_dir=MagicMock(), split=MagicMock(),
        classes=list(classes), test_mode=True)
    assert custom_dataset.CLASSES != original_classes
    assert custom_dataset.CLASSES == list(classes)

    custom_dataset = dataset_class(
        pipeline=[], img_dir=MagicMock(), split=MagicMock(),
        classes=[classes[0]], test_mode=True)
    assert custom_dataset.CLASSES != original_classes
    assert custom_dataset.CLASSES == [classes[0]]

    if dataset_class is CustomDataset:
        # CustomDataset has no default CLASSES: testing without classes
        # is a constructor-time AssertionError
        with pytest.raises(AssertionError):
            dataset_class(pipeline=[], img_dir=MagicMock(), split=MagicMock(),
                          classes=None, test_mode=True)
    else:
        custom_dataset = dataset_class(
            pipeline=[], img_dir=MagicMock(), split=MagicMock(), classes=None,
            test_mode=True)
        assert custom_dataset.CLASSES == original_classes


@patch.object(CustomDataset, 'load_annotations', MagicMock())
@patch.object(CustomDataset, '__getitem__',
              MagicMock(side_effect=lambda idx: idx))
def test_random_palette_is_generated():
    dataset = CustomDataset(pipeline=[], img_dir=MagicMock(),
                            split=MagicMock(), classes=('bus', 'car'),
                            test_mode=True)
    assert len(dataset.PALETTE) == 2
    for class_color in dataset.PALETTE:
        assert len(class_color) == 3
        assert all(0 <= x <= 255 for x in class_color)


@patch.object(CustomDataset, 'load_annotations', MagicMock())
@patch.object(CustomDataset, '__getitem__',
              MagicMock(side_effect=lambda idx: idx))
def test_custom_palette_is_kept():
    dataset = CustomDataset(pipeline=[], img_dir=MagicMock(),
                            split=MagicMock(), classes=('bus', 'car'),
                            palette=[[100, 100, 100], [200, 200, 200]],
                            test_mode=True)
    assert tuple(dataset.PALETTE) == tuple([[100, 100, 100], [200, 200, 200]])
