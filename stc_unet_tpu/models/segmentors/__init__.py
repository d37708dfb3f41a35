from .base import BaseSegmentor
from .cascade_encoder_decoder import CascadeEncoderDecoder
from .encoder_decoder import EncoderDecoder, EncoderDecoderNet
from .encoder_decoder_full import EncoderDecoderFull, IdentityBackbone

__all__ = ['BaseSegmentor', 'EncoderDecoder', 'EncoderDecoderNet',
           'EncoderDecoderFull', 'IdentityBackbone', 'CascadeEncoderDecoder']
