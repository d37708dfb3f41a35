# Ported from the reference zoo (configs/vit/upernet_deit-s16_512x512_80k_ade20k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './upernet_vit-b16_mln_512x512_80k_ade20k.py'
model = {'pretrained': 'pretrain/deit_small_patch16_224-cd65a155.pth',
 'backbone': {'num_heads': 6, 'embed_dims': 384, 'drop_path_rate': 0.1},
 'decode_head': {'num_classes': 150, 'in_channels': [384, 384, 384, 384]},
 'neck': None,
 'auxiliary_head': {'num_classes': 150, 'in_channels': 384}}
