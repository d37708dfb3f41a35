_base_ = [
    '../_base_/models/pspnet_r50-d8.py',
    '../_base_/datasets/cityscapes.py',
    '../_base_/default_runtime.py',
    '../_base_/schedules/schedule_80k.py',
]
model = dict(
    backbone=dict(_delete_=True, type='MobileNetV2',
                  widen_factor=1.0, strides=(1, 2, 2, 1, 1, 1, 1),
                  dilations=(1, 1, 1, 2, 2, 4, 4),
                  out_indices=(1, 2, 4, 6)),
    decode_head=dict(in_channels=320),
    auxiliary_head=dict(in_channels=96))
