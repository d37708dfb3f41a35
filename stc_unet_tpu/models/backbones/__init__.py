from .beit import BEiT, MAE
from .bisenet import BiSeNetV1, BiSeNetV2
from .convnext import ConvNeXt, TIMMBackbone
from .fast_scnn import FastSCNN
from .hrnet import HRNet
from .lightweight import CGNet, ERFNet, ICNet
from .maxvit_encoder import MaxViT
from .mit import MixVisionTransformer
from .mobilenet_v2 import MobileNetV2
from .mobilenet_v3 import MobileNetV3
from .poolformer import PoolFormer
from .resnet import ResNet, ResNetV1c, ResNetV1d
from .resnext import ResNeSt, ResNeXt
from .self_define import ClsResNet18, Self_Define_Backbone
from .stdc import STDCContextPathNet, STDCNet
from .swin import SwinTransformer
from .twins import PCPVT, SVT
from .unet import UNet
from .unet_backbone import (KernelSelectAttention, TransformerBlock,
                            UnetBackbone)
from .vit import VisionTransformer

__all__ = ['UnetBackbone', 'KernelSelectAttention', 'TransformerBlock',
           'ResNet', 'ResNetV1c', 'ResNetV1d', 'MaxViT', 'UNet',
           'MobileNetV2', 'MobileNetV3', 'SwinTransformer',
           'MixVisionTransformer', 'VisionTransformer', 'HRNet', 'ResNeXt',
           'ResNeSt', 'BiSeNetV1', 'BiSeNetV2', 'FastSCNN', 'CGNet',
           'ERFNet', 'ICNet', 'STDCNet', 'STDCContextPathNet',
           'BEiT', 'MAE', 'PCPVT', 'SVT', 'ConvNeXt', 'TIMMBackbone',
           'Self_Define_Backbone', 'ClsResNet18', 'PoolFormer']
