# Ported from the reference zoo (configs/swin/upernet_swin_base_patch4_window12_512x512_160k_ade20k_pretrain_384x384_1K.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['upernet_swin_tiny_patch4_window7_512x512_160k_ade20k_pretrain_224x224_1K.py']
checkpoint_file = 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/swin/swin_base_patch4_window12_384_20220317-55b0104a.pth'
model = {'backbone': {'init_cfg': {'type': 'Pretrained',
                           'checkpoint': 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/swin/swin_base_patch4_window12_384_20220317-55b0104a.pth'},
              'pretrain_img_size': 384,
              'embed_dims': 128,
              'depths': [2, 2, 18, 2],
              'num_heads': [4, 8, 16, 32],
              'window_size': 12},
 'decode_head': {'in_channels': [128, 256, 512, 1024], 'num_classes': 150},
 'auxiliary_head': {'in_channels': 512, 'num_classes': 150}}
