_base_ = [
    '../_base_/models/fcn_r50-d8.py',
    '../_base_/datasets/ade20k.py',
    '../_base_/default_runtime.py',
    '../_base_/schedules/schedule_80k.py',
]
num_stages = 3
conv_kernel_size = 1
model = dict(
    type='EncoderDecoder',
    decode_head=dict(
        _delete_=True,
        type='IterativeDecodeHead',
        num_stages=num_stages,
        num_classes=150,
        in_channels=2048,
        channels=512,
        kernel_generate_head=dict(
            type='UPerHead',
            in_channels=[256, 512, 1024, 2048],
            in_index=[0, 1, 2, 3],
            input_transform='multiple_select',
            pool_scales=(1, 2, 3, 6),
            channels=512,
            num_classes=150,
            norm_cfg=dict(type='SyncBN', requires_grad=True),
            align_corners=False,
            loss_decode=dict(type='CrossEntropyLoss',
                             use_sigmoid=False, loss_weight=1.0)),
        kernel_update_head=dict(
            num_classes=150, num_heads=8, in_channels=256,
            out_channels=256, feedforward_channels=2048)),
    auxiliary_head=dict(in_channels=1024, num_classes=150))
optimizer = dict(_delete_=True, type='AdamW', lr=0.0001,
                 betas=(0.9, 0.999), weight_decay=0.0005)
