# Ported from the reference zoo (configs/icnet/icnet_r101-d8_in1k-pre_832x832_160k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './icnet_r50-d8_832x832_160k_cityscapes.py'
model = {'backbone': {'backbone_cfg': {'depth': 101,
                               'init_cfg': {'type': 'Pretrained',
                                            'checkpoint': 'open-mmlab://resnet101_v1c'}}}}
