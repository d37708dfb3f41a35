from .aspp_head import ASPPHead, ASPPModule
from .decode_head import BaseDecodeHead
from .fcn_head import FCNHead
from .psp_head import PPM, PSPHead
from .sep_aspp_head import DepthwiseSeparableASPPHead
from .unet_head import CoordAtt, UnetHead

__all__ = ['BaseDecodeHead', 'UnetHead', 'CoordAtt', 'FCNHead', 'PSPHead',
           'PPM', 'ASPPHead', 'ASPPModule', 'DepthwiseSeparableASPPHead']
