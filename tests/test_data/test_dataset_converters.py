"""Drive the dataset-converter CLIs end-to-end on synthetic archives
(≙ reference ``tools/convert_datasets/*`` behavior checks)."""
import os
import os.path as osp
import subprocess
import sys
import zipfile

import numpy as np
import pytest
from PIL import Image

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
TOOLS = osp.join(REPO, 'tools', 'convert_datasets')


def _run(script, *args):
    r = subprocess.run([sys.executable, osp.join(TOOLS, script), *args],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def _png(path, arr):
    os.makedirs(osp.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def _zip_dir(zip_path, src_root):
    with zipfile.ZipFile(zip_path, 'w') as z:
        for root, _, files in os.walk(src_root):
            for f in files:
                full = osp.join(root, f)
                z.write(full, osp.relpath(full, src_root))


def test_loveda(tmp_path):
    src = tmp_path / 'src'
    for split in ('Train', 'Val', 'Test'):
        for scene in ('Rural', 'Urban'):
            d = src / 'stage' / split / scene
            img = np.zeros((8, 8, 3), np.uint8)
            _png(str(d / 'images_png' / f'{scene}_1.png'), img)
            if split != 'Test':
                _png(str(d / 'masks_png' / f'{scene}_1.png'),
                     np.ones((8, 8), np.uint8))
        _zip_dir(str(src / f'{split}.zip'), str(src / 'stage'))
        import shutil
        shutil.rmtree(src / 'stage')
    out = tmp_path / 'out'
    _run('loveda.py', str(src), '-o', str(out))
    assert sorted(os.listdir(out / 'img_dir' / 'train')) == \
        ['Rural_1.png', 'Urban_1.png']
    assert len(os.listdir(out / 'ann_dir' / 'val')) == 2
    assert len(os.listdir(out / 'img_dir' / 'test')) == 2
    assert not (out / 'ann_dir' / 'test').exists()


def test_potsdam(tmp_path):
    src = tmp_path / 'src'
    stage = tmp_path / 'stage'
    rgb = np.full((100, 90, 3), 7, np.uint8)
    os.makedirs(stage, exist_ok=True)
    Image.fromarray(rgb).save(str(stage / 'top_potsdam_2_10_RGB.tif'))
    lab = np.zeros((100, 90, 3), np.uint8)
    lab[:, :] = (0, 0, 255)  # building (id 2 pre-reduce)
    lab[:10, :10] = (255, 0, 0)  # clutter (id 6)
    Image.fromarray(lab).save(str(stage / 'top_potsdam_2_10_label.tif'))
    os.makedirs(src, exist_ok=True)
    _zip_dir(str(src / 'potsdam.zip'), str(stage))
    out = tmp_path / 'out'
    _run('potsdam.py', str(src), '-o', str(out), '--clip_size', '64')
    imgs = sorted(os.listdir(out / 'img_dir' / 'train'))
    anns = sorted(os.listdir(out / 'ann_dir' / 'train'))
    assert len(imgs) == 4 and len(anns) == 4  # 2x2 tiles (64 + shifted)
    a = np.asarray(Image.open(out / 'ann_dir' / 'train' / anns[0]))
    assert set(np.unique(a)) <= {2, 6}
    assert a.shape == (64, 64)


def test_vaihingen(tmp_path):
    src = tmp_path / 'src'
    stage = tmp_path / 'stage'
    os.makedirs(stage / 'top', exist_ok=True)
    rgb = np.full((70, 70, 3), 5, np.uint8)
    Image.fromarray(rgb).save(
        str(stage / 'top' / 'top_mosaic_09cm_area1.tif'))
    os.makedirs(src, exist_ok=True)
    _zip_dir(str(src / 'ISPRS_semantic_labeling_Vaihingen.zip'), str(stage))
    stage2 = tmp_path / 'stage2'
    os.makedirs(stage2, exist_ok=True)
    lab = np.zeros((70, 70, 3), np.uint8)
    lab[:, :] = (255, 255, 255)  # impervious → id 1
    Image.fromarray(lab).save(
        str(stage2 / 'top_mosaic_09cm_area1_noBoundary.tif'))
    _zip_dir(str(
        src / 'ISPRS_semantic_labeling_Vaihingen_ground_truth_eroded_'
              'COMPLETE.zip'), str(stage2))
    out = tmp_path / 'out'
    _run('vaihingen.py', str(src), '-o', str(out), '--clip_size', '64')
    assert len(os.listdir(out / 'img_dir' / 'train')) == 4
    anns = sorted(os.listdir(out / 'ann_dir' / 'train'))
    assert len(anns) == 4
    a = np.asarray(Image.open(out / 'ann_dir' / 'train' / anns[0]))
    assert set(np.unique(a)) == {1}


def test_isaid(tmp_path):
    src = tmp_path / 'src'
    for split in ('train', 'val', 'test'):
        stage = tmp_path / f'stage_{split}'
        img = np.full((40, 50, 3), 9, np.uint8)
        _png(str(stage / 'images' / f'P{split}0.png'), img)
        os.makedirs(src / split / 'images', exist_ok=True)
        _zip_dir(str(src / split / 'images' / 'part1.zip'), str(stage))
        if split == 'test':
            continue
        stage_l = tmp_path / f'stagel_{split}'
        lab = np.zeros((40, 50, 3), np.uint8)
        lab[:, :] = (0, 0, 63)  # class 1
        _png(str(stage_l / 'images' /
                 f'P{split}0_instance_color_RGB.png'), lab)
        os.makedirs(src / split / 'Semantic_masks', exist_ok=True)
        _zip_dir(str(src / split / 'Semantic_masks' / 'part1.zip'),
                 str(stage_l))
    out = tmp_path / 'out'
    _run('isaid.py', str(src), '-o', str(out),
         '--patch_width', '32', '--patch_height', '32',
         '--overlap_area', '16')
    train_imgs = os.listdir(out / 'img_dir' / 'train')
    train_anns = os.listdir(out / 'ann_dir' / 'train')
    assert len(train_imgs) == len(train_anns) > 0
    assert all(f.endswith('_instance_color_RGB.png') for f in train_anns)
    a = np.asarray(Image.open(
        osp.join(out, 'ann_dir', 'train', train_anns[0])))
    assert a.shape == (32, 32) and set(np.unique(a)) <= {1, 255}
    assert os.listdir(out / 'img_dir' / 'test') == ['Ptest0.png']


def test_coco_stuff164k(tmp_path):
    ann = tmp_path / 'annotations' / 'train2017'
    mask = np.zeros((6, 6), np.uint8)
    mask[0, :] = 11   # unused id → 255
    mask[1, :] = 12   # first id after the gap → trainId 11
    mask[2, :] = 181  # last id → 170
    mask[3, :] = 255  # unlabeled stays
    _png(str(ann / 'x.png'), mask)
    (tmp_path / 'annotations' / 'val2017').mkdir()
    _run('coco_stuff164k.py', str(tmp_path), '--nproc', '1')
    out = np.asarray(Image.open(ann / 'x_labelTrainIds.png'))
    assert out[0, 0] == 255 and out[1, 0] == 11 and out[2, 0] == 170
    assert out[3, 0] == 255 and out[5, 0] == 0


def test_coco_stuff10k(tmp_path):
    from scipy.io import savemat
    (tmp_path / 'imageLists').mkdir()
    (tmp_path / 'images').mkdir()
    (tmp_path / 'annotations').mkdir()
    _png(str(tmp_path / 'images' / 'img1.jpg'),
         np.zeros((6, 6, 3), np.uint8))
    mat = np.zeros((6, 6), np.uint8)
    mat[0, :] = 0    # unlabeled stays 0
    mat[1, :] = 1    # first class → 1
    mat[2, :] = 13   # after the gap at 12 → 12
    mat[3, :] = 182  # last → 171
    mat[4, :] = 12   # unused → 255
    savemat(str(tmp_path / 'annotations' / 'img1.mat'), {'S': mat})
    (tmp_path / 'imageLists' / 'train.txt').write_text('img1\n')
    (tmp_path / 'imageLists' / 'test.txt').write_text('')
    out = tmp_path / 'out'
    _run('coco_stuff10k.py', str(tmp_path), '-o', str(out), '--nproc', '1')
    png = np.asarray(Image.open(
        out / 'annotations' / 'train2014' / 'img1_labelTrainIds.png'))
    assert png[0, 0] == 0 and png[1, 0] == 1 and png[2, 0] == 12
    assert png[3, 0] == 171 and png[4, 0] == 255
    assert (out / 'images' / 'train2014' / 'img1.jpg').exists()
