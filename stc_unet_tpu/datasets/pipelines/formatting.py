"""Formatting transforms (≙ reference ``datasets/pipelines/formatting.py``).

TPU-native layout decision: the reference formats to CHW torch tensors inside
DataContainers (``formatting.py:179,220``); this framework keeps **HWC numpy**
(NHWC is the TPU-friendly layout — batching + ``jax.device_put`` happen in the
dataloader, SURVEY.md §2.10). ``img_metas`` becomes a plain dict.
"""
from __future__ import annotations

import numpy as np

from ..builder import PIPELINES


def to_numpy(data):
    if isinstance(data, np.ndarray):
        return data
    return np.asarray(data)


#: API-parity alias (reference ``formatting.py:14`` exposes ``to_tensor``
#: converting to torch.Tensor; this framework's model-ready array type is
#: numpy/NHWC — same contract, TPU-native container).
to_tensor = to_numpy


@PIPELINES.register_module()
class ToTensor:
    """Convert listed keys to arrays (reference ``formatting.py:38``)."""

    def __init__(self, keys):
        self.keys = keys

    def __call__(self, results):
        for key in self.keys:
            results[key] = to_numpy(results[key])
        return results

    def __repr__(self):
        return f'{self.__class__.__name__}(keys={self.keys})'


@PIPELINES.register_module()
class ImageToTensor:
    """Image to model-ready array (reference ``formatting.py:68`` makes CHW;
    here: float32 HWC, grayscale expanded to 1 channel)."""

    def __init__(self, keys):
        self.keys = keys

    def __call__(self, results):
        for key in self.keys:
            img = results[key]
            if img.ndim < 3:
                img = np.expand_dims(img, -1)
            results[key] = np.ascontiguousarray(img.astype(np.float32))
        return results

    def __repr__(self):
        return f'{self.__class__.__name__}(keys={self.keys})'


@PIPELINES.register_module()
class Transpose:
    """Transpose listed keys (reference ``formatting.py:106``)."""

    def __init__(self, keys, order):
        self.keys = keys
        self.order = order

    def __call__(self, results):
        for key in self.keys:
            results[key] = results[key].transpose(self.order)
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}(keys={self.keys}, '
                f'order={self.order})')


@PIPELINES.register_module()
class DefaultFormatBundle:
    """Format img + gt to model-ready arrays (reference ``formatting.py:179``).

    img → float32 HWC; gt_semantic_seg → int64 (H, W) (the reference keeps a
    leading channel dim from its CHW convention; batching adds N here).
    """

    def __call__(self, results):
        if 'img' in results:
            img = results['img']
            if img.ndim < 3:
                img = np.expand_dims(img, -1)
            results['img'] = np.ascontiguousarray(img.astype(np.float32))
        if 'gt_semantic_seg' in results:
            results['gt_semantic_seg'] = results['gt_semantic_seg'].astype(
                np.int64)
        return results

    def __repr__(self):
        return self.__class__.__name__


@PIPELINES.register_module()
class DeviceFormatBundle:
    """Host tail of the on-device augmentation path
    (``datasets/device_pipeline.py``): pad img/gt to one static ``size``
    and emit **uint8** arrays plus the un-padded ``valid_hw`` extent.

    The device program (RandomCrop/RandomFlip/PhotoMetricDistortion/
    Normalize fused in one jitted function) consumes the uint8 batch —
    H2D traffic stays uint8 and every sample in an epoch shares one XLA
    shape.
    """

    def __init__(self, size, pad_val=0, seg_pad_val=255):
        self.size = tuple(size)
        self.pad_val = pad_val
        self.seg_pad_val = seg_pad_val

    def _pad(self, arr, val):
        h, w = arr.shape[:2]
        if h > self.size[0] or w > self.size[1]:
            # never truncate silently: a sample larger than the static
            # size means device_pipeline_size (or the inferred host size)
            # is misconfigured, and cropping here would skew the crop
            # distribution vs the host pipeline
            raise ValueError(
                f'DeviceFormatBundle: sample {(h, w)} exceeds the static '
                f'host size {self.size}; set data.device_pipeline_size '
                f'to at least the largest Resize output')
        ph, pw = self.size[0] - h, self.size[1] - w
        if ph == 0 and pw == 0:
            return arr
        pad = ((0, ph), (0, pw)) + ((0, 0),) * (arr.ndim - 2)
        return np.pad(arr, pad, constant_values=val)

    def __call__(self, results):
        img = results['img']
        if img.ndim < 3:
            img = np.expand_dims(img, -1)
        results['valid_hw'] = np.asarray(
            [min(img.shape[0], self.size[0]),
             min(img.shape[1], self.size[1])], np.int32)
        results['img'] = np.ascontiguousarray(
            self._pad(img, self.pad_val).astype(np.uint8))
        if 'gt_semantic_seg' in results:
            results['gt_semantic_seg'] = np.ascontiguousarray(
                self._pad(results['gt_semantic_seg'],
                          self.seg_pad_val).astype(np.uint8))
        return results

    def __repr__(self):
        return f'{self.__class__.__name__}(size={self.size})'


@PIPELINES.register_module()
class ToDataContainer:
    """Name-parity no-op (reference ``formatting.py:140``).

    The reference wraps fields in ``mmcv.DataContainer`` to control collate
    stacking; this framework has no DataContainer concept — the loader
    always pads/stacks to static shapes (``datasets/builder.py``), which is
    what ``stack=True`` asked for. Accepted so reference pipeline configs
    containing this op compose unchanged.
    """

    def __init__(self, fields=(dict(key='img', stack=True),
                               dict(key='gt_semantic_seg'))):
        self.fields = fields

    def __call__(self, results):
        return results

    def __repr__(self):
        return f'{self.__class__.__name__}(fields={self.fields})'


@PIPELINES.register_module()
class Collect:
    """Collect data keys + meta (reference ``formatting.py:220``).

    Produces ``{'img_metas': {meta_key: value}, key: array}`` — the plain-dict
    equivalent of the reference's DataContainer(cpu_only=True) meta.
    """

    DEFAULT_META_KEYS = ('filename', 'ori_filename', 'ori_shape', 'img_shape',
                         'pad_shape', 'scale_factor', 'flip',
                         'flip_direction', 'img_norm_cfg')

    def __init__(self, keys, meta_keys=DEFAULT_META_KEYS):
        self.keys = keys
        self.meta_keys = meta_keys

    def __call__(self, results):
        data = {}
        img_meta = {}
        for key in self.meta_keys:
            if key in results:
                img_meta[key] = results[key]
        data['img_metas'] = img_meta
        for key in self.keys:
            data[key] = results[key]
        return data

    def __repr__(self):
        return (f'{self.__class__.__name__}(keys={self.keys}, '
                f'meta_keys={self.meta_keys})')
