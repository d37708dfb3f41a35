# Ported from the reference zoo (configs/deeplabv3/deeplabv3_r18-d8_769x769_80k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './deeplabv3_r50-d8_769x769_80k_cityscapes.py'
model = {'pretrained': 'open-mmlab://resnet18_v1c',
 'backbone': {'depth': 18},
 'decode_head': {'in_channels': 512, 'channels': 128},
 'auxiliary_head': {'in_channels': 256, 'channels': 64}}
