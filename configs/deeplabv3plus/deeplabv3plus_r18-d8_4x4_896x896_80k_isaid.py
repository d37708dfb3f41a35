# Ported from the reference zoo (configs/deeplabv3plus/deeplabv3plus_r18-d8_4x4_896x896_80k_isaid.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './deeplabv3plus_r50-d8_4x4_896x896_80k_isaid.py'
model = {'pretrained': 'open-mmlab://resnet18_v1c',
 'backbone': {'depth': 18},
 'decode_head': {'c1_in_channels': 64,
                 'c1_channels': 12,
                 'in_channels': 512,
                 'channels': 128},
 'auxiliary_head': {'in_channels': 256, 'channels': 64}}
