# Ported from the reference zoo (configs/upernet/upernet_r18_512x1024_40k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './upernet_r50_512x1024_40k_cityscapes.py'
model = {'pretrained': 'open-mmlab://resnet18_v1c',
 'backbone': {'depth': 18},
 'decode_head': {'in_channels': [64, 128, 256, 512]},
 'auxiliary_head': {'in_channels': 256}}
