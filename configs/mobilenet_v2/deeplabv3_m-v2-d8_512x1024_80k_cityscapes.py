# Ported from the reference zoo (configs/mobilenet_v2/deeplabv3_m-v2-d8_512x1024_80k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = '../deeplabv3/deeplabv3_r101-d8_512x1024_80k_cityscapes.py'
model = {'pretrained': 'mmcls://mobilenet_v2',
 'backbone': {'_delete_': True,
              'type': 'MobileNetV2',
              'widen_factor': 1.0,
              'strides': (1, 2, 2, 1, 1, 1, 1),
              'dilations': (1, 1, 1, 2, 2, 4, 4),
              'out_indices': (1, 2, 4, 6),
              'norm_cfg': {'type': 'SyncBN', 'requires_grad': True}},
 'decode_head': {'in_channels': 320},
 'auxiliary_head': {'in_channels': 96}}
