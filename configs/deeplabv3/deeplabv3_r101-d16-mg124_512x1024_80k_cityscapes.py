# Ported from the reference zoo (configs/deeplabv3/deeplabv3_r101-d16-mg124_512x1024_80k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './deeplabv3_r50-d8_512x1024_80k_cityscapes.py'
model = {'pretrained': 'open-mmlab://resnet101_v1c',
 'backbone': {'depth': 101,
              'dilations': (1, 1, 1, 2),
              'strides': (1, 2, 2, 1),
              'multi_grid': (1, 2, 4)},
 'decode_head': {'dilations': (1, 6, 12, 18),
                 'sampler': {'type': 'OHEMPixelSampler', 'min_kept': 100000}}}
