from .accuracy import Accuracy, accuracy
from .cross_entropy_loss import (CrossEntropyLoss, binary_cross_entropy,
                                 cross_entropy, mask_cross_entropy)
from .dice_loss import DiceLoss
from .focal_loss import FocalLoss, sigmoid_focal_loss
from .lovasz_loss import LovaszLoss, lovasz_hinge, lovasz_softmax
from .tversky_loss import IOULoss, L1Loss, TverskyLoss
from .utils import (get_class_weight, reduce_loss, weight_reduce_loss,
                    weighted_loss)

__all__ = [
    'Accuracy', 'accuracy', 'CrossEntropyLoss', 'cross_entropy', 'mask_cross_entropy', 'binary_cross_entropy',
    'DiceLoss', 'FocalLoss', 'sigmoid_focal_loss', 'LovaszLoss',
    'lovasz_hinge', 'lovasz_softmax', 'IOULoss', 'L1Loss', 'TverskyLoss',
    'get_class_weight', 'reduce_loss', 'weight_reduce_loss', 'weighted_loss',
]
