# Ported from the reference zoo (configs/pspnet/pspnet_r101-d8_512x512_80k_loveda.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './pspnet_r50-d8_512x512_80k_loveda.py'
model = {'backbone': {'depth': 101,
              'init_cfg': {'type': 'Pretrained',
                           'checkpoint': 'open-mmlab://resnet101_v1c'}}}
