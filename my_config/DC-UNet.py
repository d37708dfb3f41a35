# DC-UNet (dual-channel multires blocks + ResPath skips)
# ≙ reference my_config/DC-UNet.py
_base_ = './_base_kits19.py'
norm_cfg = dict(type='BN', requires_grad=True)
model = dict(
    type='EncoderDecoderFull',
    pretrained=None,
    decode_head=dict(
        type='DC_Unet',
        out_channels=2,
        norm_cfg=norm_cfg,
        loss_decode=[
            dict(type='CrossEntropyLoss', use_sigmoid=False,
                 loss_name='loss_bce', loss_weight=1.0),
            dict(type='DiceLoss', loss_name='loss_dice', loss_weight=1.0)
        ]))
