"""Dataset class/palette tables (≙ reference ``core/evaluation/class_names.py``).

Dict-based registry instead of the reference's per-dataset functions; the
public accessors ``get_classes(dataset)`` / ``get_palette(dataset)``
(reference ``class_names.py:294,311``) keep the same alias vocabulary.
Class/palette lists are standard public dataset metadata.
"""
from __future__ import annotations

from typing import List


def _voc_palette(n: int) -> List[List[int]]:
    """Standard PASCAL VOC colormap generator (bit-interleave)."""
    palette = []
    for j in range(n):
        lab, color = j, [0, 0, 0]
        i = 0
        while lab:
            color[0] |= ((lab >> 0) & 1) << (7 - i)
            color[1] |= ((lab >> 1) & 1) << (7 - i)
            color[2] |= ((lab >> 2) & 1) << (7 - i)
            lab >>= 3
            i += 1
        palette.append(color)
    return palette


CLASS_NAMES = {
    # the author's 2-class KiTS19 dataset (reference class_names.py:4)
    'my': ['background', 'target'],
    'cityscapes': [
        'road', 'sidewalk', 'building', 'wall', 'fence', 'pole',
        'traffic light', 'traffic sign', 'vegetation', 'terrain', 'sky',
        'person', 'rider', 'car', 'truck', 'bus', 'train', 'motorcycle',
        'bicycle'
    ],
    'voc': [
        'background', 'aeroplane', 'bicycle', 'bird', 'boat', 'bottle',
        'bus', 'car', 'cat', 'chair', 'cow', 'diningtable', 'dog', 'horse',
        'motorbike', 'person', 'pottedplant', 'sheep', 'sofa', 'train',
        'tvmonitor'
    ],
    'ade': [
        'wall', 'building', 'sky', 'floor', 'tree', 'ceiling', 'road', 'bed ',
        'windowpane', 'grass', 'cabinet', 'sidewalk', 'person', 'earth',
        'door', 'table', 'mountain', 'plant', 'curtain', 'chair', 'car',
        'water', 'painting', 'sofa', 'shelf', 'house', 'sea', 'mirror', 'rug',
        'field', 'armchair', 'seat', 'fence', 'desk', 'rock', 'wardrobe',
        'lamp', 'bathtub', 'railing', 'cushion', 'base', 'box', 'column',
        'signboard', 'chest of drawers', 'counter', 'sand', 'sink',
        'skyscraper', 'fireplace', 'refrigerator', 'grandstand', 'path',
        'stairs', 'runway', 'case', 'pool table', 'pillow', 'screen door',
        'stairway', 'river', 'bridge', 'bookcase', 'blind', 'coffee table',
        'toilet', 'flower', 'book', 'hill', 'bench', 'countertop', 'stove',
        'palm', 'kitchen island', 'computer', 'swivel chair', 'boat', 'bar',
        'arcade machine', 'hovel', 'bus', 'towel', 'light', 'truck', 'tower',
        'chandelier', 'awning', 'streetlight', 'booth', 'television receiver',
        'airplane', 'dirt track', 'apparel', 'pole', 'land', 'bannister',
        'escalator', 'ottoman', 'bottle', 'buffet', 'poster', 'stage', 'van',
        'ship', 'fountain', 'conveyer belt', 'canopy', 'washer', 'plaything',
        'swimming pool', 'stool', 'barrel', 'basket', 'waterfall', 'tent',
        'bag', 'minibike', 'cradle', 'oven', 'ball', 'food', 'step', 'tank',
        'trade name', 'microwave', 'pot', 'animal', 'bicycle', 'lake',
        'dishwasher', 'screen', 'blanket', 'sculpture', 'hood', 'sconce',
        'vase', 'traffic light', 'tray', 'ashcan', 'fan', 'pier', 'crt screen',
        'plate', 'monitor', 'bulletin board', 'shower', 'radiator', 'glass',
        'clock', 'flag'
    ],
    'loveda': [
        'background', 'building', 'road', 'water', 'barren', 'forest',
        'agricultural'
    ],
    'potsdam': [
        'impervious_surface', 'building', 'low_vegetation', 'tree', 'car',
        'clutter'
    ],
    'vaihingen': [
        'impervious_surface', 'building', 'low_vegetation', 'tree', 'car',
        'clutter'
    ],
    'isaid': [
        'background', 'ship', 'store_tank', 'baseball_diamond', 'tennis_court',
        'basketball_court', 'Ground_Track_Field', 'Bridge', 'Large_Vehicle',
        'Small_Vehicle', 'Helicopter', 'Swimming_pool', 'Roundabout',
        'Soccer_ball_field', 'plane', 'Harbor'
    ],
    'stare': ['background', 'vessel'],
}

PALETTES = {
    'my': [[0, 0, 0], [1, 1, 1]],
    'cityscapes': [
        [128, 64, 128], [244, 35, 232], [70, 70, 70], [102, 102, 156],
        [190, 153, 153], [153, 153, 153], [250, 170, 30], [220, 220, 0],
        [107, 142, 35], [152, 251, 152], [70, 130, 180], [220, 20, 60],
        [255, 0, 0], [0, 0, 142], [0, 0, 70], [0, 60, 100], [0, 80, 100],
        [0, 0, 230], [119, 11, 32]
    ],
    'voc': _voc_palette(21),
    'ade': None,  # generated below
    'loveda': [
        [255, 255, 255], [255, 0, 0], [255, 255, 0], [0, 0, 255],
        [159, 129, 183], [0, 255, 0], [255, 195, 128]
    ],
    'potsdam': [
        [255, 255, 255], [0, 0, 255], [0, 255, 255], [0, 255, 0],
        [255, 255, 0], [255, 0, 0]
    ],
    'vaihingen': [
        [255, 255, 255], [0, 0, 255], [0, 255, 255], [0, 255, 0],
        [255, 255, 0], [255, 0, 0]
    ],
    'isaid': [
        [0, 0, 0], [0, 0, 63], [0, 63, 63], [0, 63, 0], [0, 63, 127],
        [0, 63, 191], [0, 63, 255], [0, 127, 63], [0, 127, 127], [0, 0, 127],
        [0, 0, 191], [0, 0, 255], [0, 191, 127], [0, 127, 191], [0, 127, 255],
        [0, 100, 155]
    ],
    'stare': [[120, 120, 120], [6, 230, 230]],
}


def _ade_palette():
    # deterministic distinct colors for 150 classes
    import numpy as np
    rng = np.random.RandomState(42)
    return rng.randint(0, 255, size=(150, 3)).tolist()


PALETTES['ade'] = _ade_palette()

dataset_aliases = {
    'my': ['my'],
    'cityscapes': ['cityscapes'],
    'ade': ['ade', 'ade20k'],
    'voc': ['voc', 'pascal_voc', 'voc12', 'voc12aug'],
    'loveda': ['loveda'],
    'potsdam': ['potsdam'],
    'vaihingen': ['vaihingen'],
    'cocostuff': [
        'cocostuff', 'cocostuff10k', 'cocostuff164k', 'coco-stuff',
        'coco-stuff10k', 'coco-stuff164k', 'coco_stuff', 'coco_stuff10k',
        'coco_stuff164k'
    ],
    'isaid': ['isaid', 'iSAID'],
    'stare': ['stare', 'STARE'],
}


def _resolve(dataset: str):
    for name, aliases in dataset_aliases.items():
        if dataset in aliases:
            return name
    raise ValueError(f'Unrecognized dataset: {dataset}')


def get_classes(dataset: str):
    """Class names of a dataset (reference ``class_names.py:294``)."""
    if not isinstance(dataset, str):
        raise TypeError(f'dataset must a str, but got {type(dataset)}')
    name = _resolve(dataset)
    if name not in CLASS_NAMES:
        raise ValueError(f'No class table for dataset: {dataset}')
    return list(CLASS_NAMES[name])


def get_palette(dataset: str):
    """Palette of a dataset (reference ``class_names.py:311``)."""
    if not isinstance(dataset, str):
        raise TypeError(f'dataset must a str, but got {type(dataset)}')
    name = _resolve(dataset)
    if name not in PALETTES:
        raise ValueError(f'No palette table for dataset: {dataset}')
    return [list(c) for c in PALETTES[name]]
