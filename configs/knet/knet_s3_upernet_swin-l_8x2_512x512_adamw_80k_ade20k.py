# Ported from the reference zoo (configs/knet/knet_s3_upernet_swin-l_8x2_512x512_adamw_80k_ade20k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = 'knet_s3_upernet_swin-t_8x2_512x512_adamw_80k_ade20k.py'
checkpoint_file = 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/swin/swin_large_patch4_window7_224_22k_20220308-d5bdebaf.pth'
model = {'pretrained': 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/swin/swin_large_patch4_window7_224_22k_20220308-d5bdebaf.pth',
 'backbone': {'embed_dims': 192,
              'depths': [2, 2, 18, 2],
              'num_heads': [6, 12, 24, 48],
              'window_size': 7,
              'use_abs_pos_embed': False,
              'drop_path_rate': 0.3,
              'patch_norm': True},
 'decode_head': {'kernel_generate_head': {'in_channels': [192,
                                                          384,
                                                          768,
                                                          1536]}},
 'auxiliary_head': {'in_channels': 768}}
data = {'samples_per_gpu': 2, 'workers_per_gpu': 2}
