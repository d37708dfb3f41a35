# Ported from the reference zoo (configs/knet/knet_s3_upernet_swin-t_8x2_512x512_adamw_80k_ade20k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = 'knet_s3_upernet_r50-d8_8x2_512x512_adamw_80k_ade20k.py'
checkpoint_file = 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/swin/swin_tiny_patch4_window7_224_20220308-f41b89d3.pth'
norm_cfg = {'type': 'SyncBN', 'requires_grad': True}
num_stages = 3
conv_kernel_size = 1
model = {'type': 'EncoderDecoder',
 'pretrained': 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/swin/swin_tiny_patch4_window7_224_20220308-f41b89d3.pth',
 'backbone': {'_delete_': True,
              'type': 'SwinTransformer',
              'embed_dims': 96,
              'depths': [2, 2, 6, 2],
              'num_heads': [3, 6, 12, 24],
              'window_size': 7,
              'mlp_ratio': 4,
              'qkv_bias': True,
              'qk_scale': None,
              'drop_rate': 0.0,
              'attn_drop_rate': 0.0,
              'drop_path_rate': 0.3,
              'use_abs_pos_embed': False,
              'patch_norm': True,
              'out_indices': (0, 1, 2, 3)},
 'decode_head': {'kernel_generate_head': {'in_channels': [96, 192, 384, 768]}},
 'auxiliary_head': {'in_channels': 384}}
optimizer = {'_delete_': True,
 'type': 'AdamW',
 'lr': 6e-05,
 'betas': (0.9, 0.999),
 'weight_decay': 0.0005,
 'paramwise_cfg': {'custom_keys': {'absolute_pos_embed': {'decay_mult': 0.0},
                                   'relative_position_bias_table': {'decay_mult': 0.0},
                                   'norm': {'decay_mult': 0.0}}}}
optimizer_config = {'grad_clip': {'max_norm': 1, 'norm_type': 2}}
lr_config = {'_delete_': True,
 'policy': 'step',
 'warmup': 'linear',
 'warmup_iters': 1000,
 'warmup_ratio': 0.001,
 'step': [60000, 72000],
 'by_epoch': False}
data = {'samples_per_gpu': 2, 'workers_per_gpu': 2}
