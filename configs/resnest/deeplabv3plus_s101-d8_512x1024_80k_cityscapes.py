_base_ = [
    '../_base_/models/deeplabv3plus_r50-d8.py',
    '../_base_/datasets/cityscapes.py',
    '../_base_/default_runtime.py',
    '../_base_/schedules/schedule_80k.py',
]
model = dict(backbone=dict(_delete_=True, type='ResNeSt',
                           depth=101, radix=2,
                           out_indices=(0, 1, 2, 3),
                           dilations=(1, 1, 2, 4),
                           strides=(1, 2, 1, 1),
                           contract_dilation=True))
