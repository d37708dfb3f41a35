from .acc_head import ACCUNet
from .ann_head import ANNHead
from .aspp_head import ASPPHead, ASPPModule
from .carunet_head import CADRB, CARUnet, DenseASPPBlock, SKAttention
from .cascade_decode_head import BaseCascadeDecodeHead
from .cc_head import CCHead, DepthwiseSeparableFCNHead
from .da_head import DAHead
from .dc_unet_head import DC_Unet
from .extra_unet_heads import LinkNet, MultiResUnet, ResUNet
from .dpt_head import DPTHead
from .ege_head import EGEUNet
from .eiunet_head import EIU_Net
from .decode_head import BaseDecodeHead
from .enc_head import EncHead
from .fcn_head import FCNHead
from .fpn_head import FPNHead
from .knet_head import IterativeDecodeHead, KernelUpdateHead, KernelUpdator
from .levit_head import LeViT_UNet_192
from .maxvit_decoder import MaxViTDecoder
from .meta_head import META, META_Unet
from .misc_heads import (APCHead, DMHead, DNLHead, EMAHead, ISAHead,
                         LRASPPHead, STDCHead)
from .nl_head import GCHead, NLHead
from .ocr_head import OCRHead
from .pdatt_head import PYAttUNet
from .point_head import PointHead
from .psa_head import PSAHead
from .psp_head import PPM, PSPHead
from .segformer_head import SegformerHead
from .sep_aspp_head import DepthwiseSeparableASPPHead
from .setr_heads import (SegmenterMaskTransformerHead, SETRMLAHead,
                         SETRUPHead)
from .swinunet_head import SwinUNet
from .transunet_head import TransUNet, TransUNetModule
from .unet_head import CoordAtt, UnetHead
from .unetpp_head import UnetPlusPlus
from .uper_head import UPerHead
from .vit import ViT

__all__ = ['BaseDecodeHead', 'BaseCascadeDecodeHead', 'UnetHead', 'CoordAtt',
           'FCNHead', 'PSPHead', 'PPM', 'ASPPHead', 'ASPPModule',
           'DepthwiseSeparableASPPHead', 'DC_Unet', 'SwinUNet', 'TransUNet',
           'TransUNetModule', 'UnetPlusPlus', 'ViT', 'MaxViTDecoder',
           'OCRHead', 'UPerHead', 'FPNHead', 'SegformerHead', 'ANNHead',
           'DAHead', 'EncHead', 'APCHead', 'DMHead', 'DNLHead', 'EMAHead',
           'ISAHead', 'LRASPPHead', 'STDCHead', 'GCHead', 'NLHead',
           'SegmenterMaskTransformerHead', 'SETRMLAHead', 'SETRUPHead',
           'CCHead', 'DepthwiseSeparableFCNHead', 'PointHead', 'PSAHead',
           'DPTHead', 'IterativeDecodeHead', 'KernelUpdateHead',
           'KernelUpdator', 'ResUNet', 'LinkNet', 'MultiResUnet', 'CARUnet',
           'CADRB', 'DenseASPPBlock', 'SKAttention', 'EGEUNet', 'ACCUNet', 'META_Unet', 'META', 'PYAttUNet', 'LeViT_UNet_192', 'EIU_Net']
