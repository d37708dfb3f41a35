# Shorthand alias for the reference recipe (same model, AdamW + linear
# warmup + decay_mult=0 paramwise keys — see the base file).
_base_ = ['./upernet_swin_tiny_patch4_window7_512x512_160k_ade20k_'
          'pretrain_224x224_1K.py']
