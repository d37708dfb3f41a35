# Ported from the reference zoo (configs/segformer/segformer_mit-b5_8x1_1024x1024_160k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['./segformer_mit-b0_8x1_1024x1024_160k_cityscapes.py']
checkpoint = 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/segformer/mit_b5_20220624-658746d9.pth'
model = {'backbone': {'init_cfg': {'type': 'Pretrained',
                           'checkpoint': 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/segformer/mit_b5_20220624-658746d9.pth'},
              'embed_dims': 64,
              'num_layers': [3, 6, 40, 3]},
 'decode_head': {'in_channels': [64, 128, 320, 512]}}
