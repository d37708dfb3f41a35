# Ported from the reference zoo (configs/pspnet/pspnet_r18-d8_512x512_80k_loveda.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './pspnet_r50-d8_512x512_80k_loveda.py'
model = {'backbone': {'depth': 18,
              'init_cfg': {'type': 'Pretrained',
                           'checkpoint': 'open-mmlab://resnet18_v1c'}},
 'decode_head': {'in_channels': 512, 'channels': 128},
 'auxiliary_head': {'in_channels': 256, 'channels': 64}}
