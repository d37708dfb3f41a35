from .encoding import Encoding
from .wrappers import Upsample, resize

__all__ = ['Encoding', 'Upsample', 'resize']
