from .unet_backbone import (KernelSelectAttention, TransformerBlock,
                            UnetBackbone)

__all__ = ['UnetBackbone', 'KernelSelectAttention', 'TransformerBlock']
