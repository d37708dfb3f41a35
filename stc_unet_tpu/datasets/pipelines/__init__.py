from .compose import Compose
from .formatting import (Collect, DefaultFormatBundle, ImageToTensor,
                         ToDataContainer, ToTensor, Transpose, to_numpy,
                         to_tensor)
from .loading import LoadAnnotations, LoadImage, LoadImageFromFile
from .test_time_aug import MultiScaleFlipAug
from .transforms import (CLAHE, AdjustGamma, Normalize, Pad,
                         PhotoMetricDistortion, RandomCrop, RandomCutOut,
                         RandomFlip, RandomMosaic, RandomRotate, Rerange,
                         Resize, ResizeToMultiple, RGB2Gray, SegRescale)

__all__ = [
    'Compose', 'Collect', 'DefaultFormatBundle', 'ImageToTensor', 'ToTensor', 'ToDataContainer',
    'Transpose', 'to_numpy', 'to_tensor', 'LoadAnnotations', 'LoadImage',
    'LoadImageFromFile', 'MultiScaleFlipAug', 'CLAHE', 'AdjustGamma',
    'Normalize', 'Pad', 'PhotoMetricDistortion', 'RandomCrop', 'RandomCutOut',
    'RandomFlip', 'RandomMosaic', 'RandomRotate', 'Rerange', 'Resize',
    'ResizeToMultiple', 'RGB2Gray', 'SegRescale'
]
