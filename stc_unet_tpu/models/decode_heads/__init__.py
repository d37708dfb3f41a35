from .decode_head import BaseDecodeHead
from .unet_head import CoordAtt, UnetHead

__all__ = ['BaseDecodeHead', 'UnetHead', 'CoordAtt']
