# Ported from the reference zoo (configs/bisenetv1/bisenetv1_r18-d32_in1k-pre_lr5e-3_4x4_512x512_160k_coco-stuff164k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './bisenetv1_r18-d32_lr5e-3_4x4_512x512_160k_coco-stuff164k.py'
model = {'backbone': {'backbone_cfg': {'init_cfg': {'type': 'Pretrained',
                                            'checkpoint': 'open-mmlab://resnet18_v1c'}}}}
