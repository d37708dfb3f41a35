from .fpn import FPN
from .misc_necks import Feature2Pyramid, MLANeck, MultiLevelNeck

__all__ = ['FPN', 'Feature2Pyramid', 'MLANeck', 'MultiLevelNeck']
