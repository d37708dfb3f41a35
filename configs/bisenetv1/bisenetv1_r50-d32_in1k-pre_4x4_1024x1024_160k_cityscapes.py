# Ported from the reference zoo (configs/bisenetv1/bisenetv1_r50-d32_in1k-pre_4x4_1024x1024_160k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './bisenetv1_r50-d32_4x4_1024x1024_160k_cityscapes.py'
model = {'type': 'EncoderDecoder',
 'backbone': {'backbone_cfg': {'init_cfg': {'type': 'Pretrained',
                                            'checkpoint': 'open-mmlab://resnet50_v1c'}}}}
