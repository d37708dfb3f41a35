# Ported from the reference zoo (configs/pspnet/pspnet_r18-d8_4x4_512x512_80k_vaihingen.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './pspnet_r50-d8_4x4_512x512_80k_vaihingen.py'
model = {'pretrained': 'open-mmlab://resnet18_v1c',
 'backbone': {'depth': 18},
 'decode_head': {'in_channels': 512, 'channels': 128},
 'auxiliary_head': {'in_channels': 256, 'channels': 64}}
