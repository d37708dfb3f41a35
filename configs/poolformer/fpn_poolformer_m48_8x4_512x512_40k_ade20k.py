# Ported from the reference zoo (configs/poolformer/fpn_poolformer_m48_8x4_512x512_40k_ade20k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './fpn_poolformer_s12_8x4_512x512_40k_ade20k.py'
checkpoint_file = 'https://download.openmmlab.com/mmclassification/v0/poolformer/poolformer-m48_3rdparty_32xb128_in1k_20220414-9378f3eb.pth'
model = {'backbone': {'arch': 'm48',
              'init_cfg': {'type': 'Pretrained',
                           'checkpoint': 'https://download.openmmlab.com/mmclassification/v0/poolformer/poolformer-m48_3rdparty_32xb128_in1k_20220414-9378f3eb.pth',
                           'prefix': 'backbone.'}},
 'neck': {'in_channels': [96, 192, 384, 768]}}
