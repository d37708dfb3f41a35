# Ported from the reference zoo (configs/swin/upernet_swin_large_patch4_window7_512x512_pretrain_224x224_22K_160k_ade20k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['upernet_swin_tiny_patch4_window7_512x512_160k_ade20k_pretrain_224x224_1K.py']
checkpoint_file = 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/swin/swin_large_patch4_window7_224_22k_20220412-aeecf2aa.pth'
model = {'backbone': {'init_cfg': {'type': 'Pretrained',
                           'checkpoint': 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/swin/swin_large_patch4_window7_224_22k_20220412-aeecf2aa.pth'},
              'pretrain_img_size': 224,
              'embed_dims': 192,
              'depths': [2, 2, 18, 2],
              'num_heads': [6, 12, 24, 48],
              'window_size': 7},
 'decode_head': {'in_channels': [192, 384, 768, 1536], 'num_classes': 150},
 'auxiliary_head': {'in_channels': 768, 'num_classes': 150}}
