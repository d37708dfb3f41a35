# Ported from the reference zoo (configs/swin/upernet_swin_base_patch4_window7_512x512_160k_ade20k_pretrain_224x224_22K.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['./upernet_swin_base_patch4_window7_512x512_160k_ade20k_pretrain_224x224_1K.py']
checkpoint_file = 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/swin/swin_base_patch4_window7_224_22k_20220317-4f79f7c0.pth'
model = {'backbone': {'init_cfg': {'type': 'Pretrained',
                           'checkpoint': 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/swin/swin_base_patch4_window7_224_22k_20220317-4f79f7c0.pth'}}}
