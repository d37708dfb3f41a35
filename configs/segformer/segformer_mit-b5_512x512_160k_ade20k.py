# Ported from the reference zoo (configs/segformer/segformer_mit-b5_512x512_160k_ade20k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['./segformer_mit-b0_512x512_160k_ade20k.py']
checkpoint = 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/segformer/mit_b5_20220624-658746d9.pth'
model = {'pretrained': 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/segformer/mit_b5_20220624-658746d9.pth',
 'backbone': {'embed_dims': 64,
              'num_heads': [1, 2, 5, 8],
              'num_layers': [3, 6, 40, 3]},
 'decode_head': {'in_channels': [64, 128, 320, 512]}}
