"""Test-time augmentation (≙ reference ``pipelines/test_time_aug.py:11``).

Expands one sample into scale × flip variants, each run through the inner
transforms; per-key results are collected into lists (the aug axis the
segmentor's ``aug_test`` averages over).
"""
from __future__ import annotations

import warnings

from ..builder import PIPELINES
from .compose import Compose


@PIPELINES.register_module()
class MultiScaleFlipAug:

    def __init__(self, transforms, img_scale, img_ratios=None, flip=False,
                 flip_direction='horizontal'):
        # ctor contract ≙ reference ``test_time_aug.py:60-100``
        # (tests/test_data/test_tta.py:13-40,153-165)
        if flip:
            trans_index = {t['type']: i for i, t in enumerate(transforms)}
            if 'RandomFlip' in trans_index and 'Pad' in trans_index:
                assert trans_index['RandomFlip'] < trans_index['Pad'], \
                    'Pad must be executed after RandomFlip when flip is True'
        self.transforms = Compose(transforms)
        if img_ratios is not None:
            img_ratios = img_ratios if isinstance(img_ratios, list) \
                else [img_ratios]
            assert all(isinstance(r, float) for r in img_ratios), \
                'img_ratios must be float(s)'
        if img_scale is None:
            # mode 2: ratios on the original image shape
            self.img_scale = None
            assert isinstance(img_ratios, list) and \
                all(isinstance(r, float) for r in img_ratios), \
                'img_scale=None requires float img_ratios'
            self.img_ratios = img_ratios
        elif isinstance(img_scale, tuple) and img_ratios is not None:
            # mode 3: one scale × ratios
            assert len(img_scale) == 2
            self.img_scale = [(int(img_scale[0] * ratio),
                               int(img_scale[1] * ratio))
                              for ratio in img_ratios]
            self.img_ratios = img_ratios
        else:
            # mode 1: explicit scale(s)
            self.img_scale = img_scale if isinstance(img_scale, list) \
                else [img_scale]
            self.img_ratios = None
        assert self.img_scale is None or \
            all(isinstance(s, tuple) for s in self.img_scale), \
            'img_scale must be None, a tuple or a list of tuples'
        self.flip = flip
        self.flip_direction = flip_direction if isinstance(
            flip_direction, list) else [flip_direction]
        assert all(isinstance(d, str) for d in self.flip_direction)
        if not self.flip and self.flip_direction != ['horizontal']:
            warnings.warn(
                'flip_direction has no effect when flip is set to False')
        if self.flip and not any(
                t['type'] == 'RandomFlip' for t in transforms):
            warnings.warn(
                'flip has no effect when RandomFlip is not in transforms')

    def __call__(self, results):
        aug_data = []
        if self.img_scale is None and isinstance(self.img_ratios, list):
            h, w = results['img'].shape[:2]
            img_scale = [(int(w * ratio), int(h * ratio))
                         for ratio in self.img_ratios]
        else:
            img_scale = self.img_scale
        flip_aug = [False, True] if self.flip else [False]
        for scale in img_scale:
            for flip in flip_aug:
                for direction in self.flip_direction:
                    _results = results.copy()
                    _results['scale'] = scale
                    _results['flip'] = flip
                    _results['flip_direction'] = direction
                    data = self.transforms(_results)
                    aug_data.append(data)
        # list of dicts → dict of lists
        aug_data_dict = {key: [] for key in aug_data[0]}
        for data in aug_data:
            for key, val in data.items():
                aug_data_dict[key].append(val)
        return aug_data_dict

    def __repr__(self):
        return (f'{self.__class__.__name__}(transforms={self.transforms}, '
                f'img_scale={self.img_scale}, flip={self.flip}, '
                f'flip_direction={self.flip_direction})')
