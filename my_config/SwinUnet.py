# Swin-UNet (symmetric swin encoder-decoder with patch merge/expand)
# ≙ reference my_config/SwinUnet.py
_base_ = './_base_kits19.py'
norm_cfg = dict(type='SyncBN', requires_grad=True)
backbone_norm_cfg = dict(type='LN', requires_grad=True)
model = dict(
    type='EncoderDecoderFull',
    pretrained=None,
    decode_head=dict(
        type='SwinUNet',
        img_size=512,
        patch_size=8,
        window_size=16,
        out_channel=64,
        num_classes=2,
        loss_decode=[
            dict(type='CrossEntropyLoss', use_sigmoid=False,
                 loss_name='loss_bce', loss_weight=1.0),
            dict(type='DiceLoss', loss_name='loss_dice', loss_weight=1.0)
        ]))
