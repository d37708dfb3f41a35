from .maxvit_encoder import MaxViT
from .mit import MixVisionTransformer
from .mobilenet_v2 import MobileNetV2
from .resnet import ResNet, ResNetV1c, ResNetV1d
from .swin import SwinTransformer
from .unet import UNet
from .unet_backbone import (KernelSelectAttention, TransformerBlock,
                            UnetBackbone)
from .vit import VisionTransformer

__all__ = ['UnetBackbone', 'KernelSelectAttention', 'TransformerBlock',
           'ResNet', 'ResNetV1c', 'ResNetV1d', 'MaxViT', 'UNet',
           'MobileNetV2', 'SwinTransformer', 'MixVisionTransformer',
           'VisionTransformer']
