# Ported from the reference zoo (configs/vit/upernet_deit-b16_mln_512x512_160k_ade20k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './upernet_vit-b16_mln_512x512_160k_ade20k.py'
model = {'pretrained': 'pretrain/deit_base_patch16_224-b5f2ef4d.pth',
 'backbone': {'drop_path_rate': 0.1}}
