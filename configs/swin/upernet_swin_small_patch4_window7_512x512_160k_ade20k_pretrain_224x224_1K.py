# Ported from the reference zoo (configs/swin/upernet_swin_small_patch4_window7_512x512_160k_ade20k_pretrain_224x224_1K.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['./upernet_swin_tiny_patch4_window7_512x512_160k_ade20k_pretrain_224x224_1K.py']
checkpoint_file = 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/swin/swin_small_patch4_window7_224_20220317-7ba6d6dd.pth'
model = {'backbone': {'init_cfg': {'type': 'Pretrained',
                           'checkpoint': 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/swin/swin_small_patch4_window7_224_20220317-7ba6d6dd.pth'},
              'depths': [2, 2, 18, 2]},
 'decode_head': {'in_channels': [96, 192, 384, 768], 'num_classes': 150},
 'auxiliary_head': {'in_channels': 384, 'num_classes': 150}}
