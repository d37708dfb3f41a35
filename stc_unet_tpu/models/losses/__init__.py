from .accuracy import accuracy
from .cross_entropy_loss import (CrossEntropyLoss, binary_cross_entropy,
                                 cross_entropy)
from .dice_loss import DiceLoss
from .utils import (get_class_weight, reduce_loss, weight_reduce_loss,
                    weighted_loss)

__all__ = [
    'accuracy', 'CrossEntropyLoss', 'cross_entropy', 'binary_cross_entropy',
    'DiceLoss', 'get_class_weight', 'reduce_loss', 'weight_reduce_loss',
    'weighted_loss',
]
