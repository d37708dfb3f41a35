from .maxvit_encoder import MaxViT
from .resnet import ResNet, ResNetV1c, ResNetV1d
from .unet_backbone import (KernelSelectAttention, TransformerBlock,
                            UnetBackbone)

__all__ = ['UnetBackbone', 'KernelSelectAttention', 'TransformerBlock',
           'ResNet', 'ResNetV1c', 'ResNetV1d', 'MaxViT']
