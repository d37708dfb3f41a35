"""Stock dataset declarations (≙ reference per-dataset modules: ``ade.py``,
``voc.py``, ``drive.py``, ``stare.py``, ``chase_db1.py``, ``hrf.py``,
``loveda.py``, ``potsdam.py``, ``isprs.py``, ``isaid.py``, ``dark_zurich.py``,
``night_driving.py``, ``pascal_context.py``, ``coco_stuff.py``, ``face.py``).

Each entry is a thin CustomDataset subclass binding CLASSES/PALETTE and the
suffix conventions of a public benchmark. Where the public set has no
canonical palette, a deterministic seeded palette is used (visualization
only; metrics never read palettes).
"""
from __future__ import annotations

import os.path as osp

import numpy as np

from stc_unet_tpu.core import get_classes, get_palette
from .builder import DATASETS
from .cityscapes import CityscapesDataset
from .custom import CustomDataset


@DATASETS.register_module()
class ADE20KDataset(CustomDataset):
    """ADE20K: 150 categories, label 0 = 'others' → reduce_zero_label."""

    CLASSES = tuple(get_classes('ade'))
    PALETTE = get_palette('ade')

    def __init__(self, **kwargs):
        super().__init__(img_suffix='.jpg', seg_map_suffix='.png',
                         reduce_zero_label=True, **kwargs)

    def results2img(self, results, imgfile_prefix, to_label_id, indices=None):
        """Submission format: labels shifted back by +1 (zero was reduced)."""
        import os
        from PIL import Image
        if indices is None:
            indices = list(range(len(self)))
        os.makedirs(imgfile_prefix, exist_ok=True)
        result_files = []
        for result, idx in zip(results, indices):
            filename = self.img_infos[idx]['filename']
            basename = osp.splitext(osp.basename(filename))[0]
            png_filename = osp.join(imgfile_prefix, f'{basename}.png')
            result = result + 1
            Image.fromarray(result.astype(np.uint8)).save(png_filename)
            result_files.append(png_filename)
        return result_files

    def format_results(self, results, imgfile_prefix, to_label_id=True,
                       indices=None):
        if indices is None:
            indices = list(range(len(self)))
        assert isinstance(results, list), 'results must be a list.'
        assert isinstance(indices, list), 'indices must be a list.'
        return self.results2img(results, imgfile_prefix, to_label_id, indices)


@DATASETS.register_module()
class PascalVOCDataset(CustomDataset):
    """PASCAL VOC 2012 (requires a split file)."""

    CLASSES = tuple(get_classes('voc'))
    PALETTE = get_palette('voc')

    def __init__(self, split, **kwargs):
        super().__init__(img_suffix='.jpg', seg_map_suffix='.png',
                         split=split, **kwargs)
        assert osp.exists(self.img_dir) and self.split is not None


_VESSEL_CLASSES = ('background', 'vessel')
_VESSEL_PALETTE = [[120, 120, 120], [6, 230, 230]]


@DATASETS.register_module()
class DRIVEDataset(CustomDataset):
    """DRIVE retinal vessels: ``_manual1.png`` annotation suffix."""

    CLASSES = _VESSEL_CLASSES
    PALETTE = _VESSEL_PALETTE

    def __init__(self, **kwargs):
        super().__init__(img_suffix='.png', seg_map_suffix='_manual1.png',
                         reduce_zero_label=False, **kwargs)
        assert osp.exists(self.img_dir)


@DATASETS.register_module()
class STAREDataset(CustomDataset):
    """STARE retinal vessels: ``.ah.png`` annotation suffix."""

    CLASSES = _VESSEL_CLASSES
    PALETTE = _VESSEL_PALETTE

    def __init__(self, **kwargs):
        super().__init__(img_suffix='.png', seg_map_suffix='.ah.png',
                         reduce_zero_label=False, **kwargs)
        assert osp.exists(self.img_dir)


@DATASETS.register_module()
class ChaseDB1Dataset(CustomDataset):
    """CHASE_DB1 retinal vessels: ``_1stHO.png`` annotation suffix."""

    CLASSES = _VESSEL_CLASSES
    PALETTE = _VESSEL_PALETTE

    def __init__(self, **kwargs):
        super().__init__(img_suffix='.png', seg_map_suffix='_1stHO.png',
                         reduce_zero_label=False, **kwargs)
        assert osp.exists(self.img_dir)


@DATASETS.register_module()
class HRFDataset(CustomDataset):
    """HRF retinal vessels."""

    CLASSES = _VESSEL_CLASSES
    PALETTE = _VESSEL_PALETTE

    def __init__(self, **kwargs):
        super().__init__(img_suffix='.png', seg_map_suffix='.png',
                         reduce_zero_label=False, **kwargs)
        assert osp.exists(self.img_dir)


@DATASETS.register_module()
class LoveDADataset(CustomDataset):
    """LoveDA remote sensing; submission labels shift back by -1... the
    benchmark expects the reduced ids, written as uint8 PNGs."""

    CLASSES = tuple(get_classes('loveda'))
    PALETTE = get_palette('loveda')

    def __init__(self, **kwargs):
        super().__init__(img_suffix='.png', seg_map_suffix='.png',
                         reduce_zero_label=True, **kwargs)

    def results2img(self, results, imgfile_prefix, indices=None):
        import os
        from PIL import Image
        if indices is None:
            indices = list(range(len(self)))
        os.makedirs(imgfile_prefix, exist_ok=True)
        result_files = []
        for result, idx in zip(results, indices):
            filename = self.img_infos[idx]['filename']
            basename = osp.splitext(osp.basename(filename))[0]
            png_filename = osp.join(imgfile_prefix, f'{basename}.png')
            Image.fromarray(result.astype(np.uint8)).save(png_filename)
            result_files.append(png_filename)
        return result_files

    def format_results(self, results, imgfile_prefix, indices=None):
        if indices is None:
            indices = list(range(len(self)))
        assert isinstance(results, list), 'results must be a list.'
        assert isinstance(indices, list), 'indices must be a list.'
        return self.results2img(results, imgfile_prefix, indices)


@DATASETS.register_module()
class PotsdamDataset(CustomDataset):
    """ISPRS Potsdam aerial tiles."""

    CLASSES = tuple(get_classes('potsdam'))
    PALETTE = get_palette('potsdam')

    def __init__(self, **kwargs):
        super().__init__(img_suffix='.png', seg_map_suffix='.png',
                         reduce_zero_label=True, **kwargs)


@DATASETS.register_module()
class ISPRSDataset(CustomDataset):
    """ISPRS Vaihingen aerial tiles."""

    CLASSES = tuple(get_classes('vaihingen'))
    PALETTE = get_palette('vaihingen')

    def __init__(self, **kwargs):
        super().__init__(img_suffix='.png', seg_map_suffix='.png',
                         reduce_zero_label=True, **kwargs)


@DATASETS.register_module()
class iSAIDDataset(CustomDataset):
    """iSAID instance-to-semantic aerial dataset: annotation files carry the
    ``_instance_color_RGB`` infix (reference ``isaid.py:72-77``)."""

    CLASSES = tuple(get_classes('isaid'))
    PALETTE = get_palette('isaid')

    def __init__(self, **kwargs):
        super().__init__(img_suffix='.png', seg_map_suffix='.png',
                         ignore_index=255, **kwargs)
        assert osp.exists(self.img_dir)

    def load_annotations(self, img_dir, img_suffix, ann_dir, seg_map_suffix,
                         split):
        from .custom import scandir
        img_infos = []
        if split is not None:
            with open(split) as f:
                for line in f:
                    name = line.strip()
                    img_info = dict(filename=name + img_suffix)
                    if ann_dir is not None:
                        ann_name = name + '_instance_color_RGB'
                        img_info['ann'] = dict(
                            seg_map=ann_name + seg_map_suffix)
                    img_infos.append(img_info)
        else:
            for img in scandir(img_dir, img_suffix, recursive=True):
                img_info = dict(filename=img)
                if ann_dir is not None:
                    seg_map = img.replace(
                        img_suffix, '_instance_color_RGB' + seg_map_suffix)
                    img_info['ann'] = dict(seg_map=seg_map)
                img_infos.append(img_info)
            img_infos = sorted(img_infos, key=lambda x: x['filename'])
        return img_infos


@DATASETS.register_module()
class DarkZurichDataset(CityscapesDataset):
    """Dark Zurich (cityscapes label space, rgb_anon imagery)."""

    def __init__(self, **kwargs):
        super().__init__(img_suffix='_rgb_anon.png',
                         seg_map_suffix='_gt_labelTrainIds.png', **kwargs)


@DATASETS.register_module()
class NightDrivingDataset(CityscapesDataset):
    """NightDriving (cityscapes label space, coarse night annotations)."""

    def __init__(self, **kwargs):
        super().__init__(img_suffix='_leftImg8bit.png',
                         seg_map_suffix='_gtCoarse_labelTrainIds.png',
                         **kwargs)


# Official PascalContext palettes (reference pascal_context.py:31,80)
_PCONTEXT_PALETTE = [
    [120, 120, 120], [180, 120, 120], [6, 230, 230], [80, 50, 50], [4, 200, 3],
    [120, 120, 80], [140, 140, 140], [204, 5, 255], [230, 230, 230],
    [4, 250, 7], [224, 5, 255], [235, 255, 7], [150, 5, 61], [120, 120, 70],
    [8, 255, 51], [255, 6, 82], [143, 255, 140], [204, 255, 4], [255, 51, 7],
    [204, 70, 3], [0, 102, 200], [61, 230, 250], [255, 6, 51], [11, 102, 255],
    [255, 7, 71], [255, 9, 224], [9, 7, 230], [220, 220, 220], [255, 9, 92],
    [112, 9, 255], [8, 255, 214], [7, 255, 224], [255, 184, 6], [10, 255, 71],
    [255, 41, 10], [7, 255, 255], [224, 255, 8], [102, 8, 255], [255, 61, 6],
    [255, 194, 7], [255, 122, 8], [0, 255, 20], [255, 8, 41], [255, 5, 153],
    [6, 51, 255], [235, 12, 255], [160, 150, 20], [0, 163, 255],
    [140, 140, 140], [250, 10, 15], [20, 255, 0], [31, 255, 0], [255, 31, 0],
    [255, 224, 0], [153, 255, 0], [0, 0, 255], [255, 71, 0], [0, 235, 255],
    [0, 173, 255], [31, 0, 255]
]

# exactly the 60-class table minus background (verified equal to the
# reference's hardcoded 59-row list)
_PCONTEXT59_PALETTE = _PCONTEXT_PALETTE[1:]


@DATASETS.register_module()
class PascalContextDataset(CustomDataset):
    """PASCAL Context, 60 classes incl. background."""

    CLASSES = (
        'background', 'aeroplane', 'bag', 'bed', 'bedclothes', 'bench',
        'bicycle', 'bird', 'boat', 'book', 'bottle', 'building', 'bus',
        'cabinet', 'car', 'cat', 'ceiling', 'chair', 'cloth', 'computer',
        'cow', 'cup', 'curtain', 'dog', 'door', 'fence', 'floor', 'flower',
        'food', 'grass', 'ground', 'horse', 'keyboard', 'light', 'motorbike',
        'mountain', 'mouse', 'person', 'plate', 'platform', 'pottedplant',
        'road', 'rock', 'sheep', 'shelves', 'sidewalk', 'sign', 'sky',
        'snow', 'sofa', 'table', 'track', 'train', 'tree', 'truck',
        'tvmonitor', 'wall', 'water', 'window', 'wood')
    PALETTE = _PCONTEXT_PALETTE

    def __init__(self, split, **kwargs):
        super().__init__(img_suffix='.jpg', seg_map_suffix='.png',
                         split=split, reduce_zero_label=False, **kwargs)
        assert osp.exists(self.img_dir) and self.split is not None


@DATASETS.register_module()
class PascalContextDataset59(CustomDataset):
    """PASCAL Context without background (59 classes, reduce_zero_label)."""

    CLASSES = PascalContextDataset.CLASSES[1:]
    PALETTE = _PCONTEXT59_PALETTE

    def __init__(self, split, **kwargs):
        super().__init__(img_suffix='.jpg', seg_map_suffix='.png',
                         split=split, reduce_zero_label=True, **kwargs)
        assert osp.exists(self.img_dir) and self.split is not None


@DATASETS.register_module()
class COCOStuffDataset(CustomDataset):
    """COCO-Stuff (164k flavor: ``_labelTrainIds.png`` maps, 171 classes)."""

    CLASSES = (
        'person', 'bicycle', 'car', 'motorcycle', 'airplane', 'bus', 'train',
        'truck', 'boat', 'traffic light', 'fire hydrant', 'stop sign',
        'parking meter', 'bench', 'bird', 'cat', 'dog', 'horse', 'sheep',
        'cow', 'elephant', 'bear', 'zebra', 'giraffe', 'backpack', 'umbrella',
        'handbag', 'tie', 'suitcase', 'frisbee', 'skis', 'snowboard',
        'sports ball', 'kite', 'baseball bat', 'baseball glove', 'skateboard',
        'surfboard', 'tennis racket', 'bottle', 'wine glass', 'cup', 'fork',
        'knife', 'spoon', 'bowl', 'banana', 'apple', 'sandwich', 'orange',
        'broccoli', 'carrot', 'hot dog', 'pizza', 'donut', 'cake', 'chair',
        'couch', 'potted plant', 'bed', 'dining table', 'toilet', 'tv',
        'laptop', 'mouse', 'remote', 'keyboard', 'cell phone', 'microwave',
        'oven', 'toaster', 'sink', 'refrigerator', 'book', 'clock', 'vase',
        'scissors', 'teddy bear', 'hair drier', 'toothbrush', 'banner',
        'blanket', 'branch', 'bridge', 'building-other', 'bush', 'cabinet',
        'cage', 'cardboard', 'carpet', 'ceiling-other', 'ceiling-tile',
        'cloth', 'clothes', 'clouds', 'counter', 'cupboard', 'curtain',
        'desk-stuff', 'dirt', 'door-stuff', 'fence', 'floor-marble',
        'floor-other', 'floor-stone', 'floor-tile', 'floor-wood', 'flower',
        'fog', 'food-other', 'fruit', 'furniture-other', 'grass', 'gravel',
        'ground-other', 'hill', 'house', 'leaves', 'light', 'mat', 'metal',
        'mirror-stuff', 'moss', 'mountain', 'mud', 'napkin', 'net', 'paper',
        'pavement', 'pillow', 'plant-other', 'plastic', 'platform',
        'playingfield', 'railing', 'railroad', 'river', 'road', 'rock',
        'roof', 'rug', 'salad', 'sand', 'sea', 'shelf', 'sky-other',
        'skyscraper', 'snow', 'solid-other', 'stairs', 'stone', 'straw',
        'structural-other', 'table', 'tent', 'textile-other', 'towel',
        'tree', 'vegetable', 'wall-brick', 'wall-concrete', 'wall-other',
        'wall-panel', 'wall-stone', 'wall-tile', 'wall-wood', 'water-other',
        'waterdrops', 'window-blind', 'window-other', 'wood')
    PALETTE = get_palette('cocostuff')

    def __init__(self, **kwargs):
        super().__init__(img_suffix='.jpg',
                         seg_map_suffix='_labelTrainIds.png', **kwargs)


@DATASETS.register_module()
class FaceOccludedDataset(CustomDataset):
    """Face-occlusion binary dataset."""

    CLASSES = ('background', 'face')
    PALETTE = [[0, 0, 0], [128, 0, 0]]

    def __init__(self, split, **kwargs):
        super().__init__(img_suffix='.jpg', seg_map_suffix='.png',
                         split=split, **kwargs)
        assert osp.exists(self.img_dir) and self.split is not None
