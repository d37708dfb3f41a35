from .builder import (DATASETS, PIPELINES, DataLoader, EpochSampler,
                      build_dataloader, build_dataset, collate,
                      inject_img_cache, worker_init_fn)
from .cityscapes import CityscapesDataset
from .custom import CustomDataset
from .dataset_wrappers import (ConcatDataset, MultiImageMixDataset,
                               RepeatDataset)
from .my_dataset import MyDataset
from .zoo import (ADE20KDataset, COCOStuffDataset, ChaseDB1Dataset,
                  DarkZurichDataset, DRIVEDataset, FaceOccludedDataset,
                  HRFDataset, ISPRSDataset, LoveDADataset,
                  NightDrivingDataset, PascalContextDataset,
                  PascalContextDataset59, PascalVOCDataset, PotsdamDataset,
                  STAREDataset, iSAIDDataset)
from . import pipelines  # noqa: F401  (register transforms)
from . import samplers  # noqa: F401  (mmseg.datasets.samplers surface)
from .samplers import DistributedSampler
from .device_pipeline import (DeviceBatchLoader, make_device_train_pipeline,
                              split_train_pipeline,
                              wrap_loader_with_device_pipeline)

__all__ = [
    'DATASETS', 'PIPELINES', 'DataLoader', 'DistributedSampler',
    'EpochSampler', 'build_dataloader',
    'build_dataset', 'collate', 'inject_img_cache', 'worker_init_fn',
    'DeviceBatchLoader', 'make_device_train_pipeline', 'split_train_pipeline',
    'wrap_loader_with_device_pipeline', 'CityscapesDataset',
    'CustomDataset', 'ConcatDataset', 'MultiImageMixDataset', 'RepeatDataset',
    'MyDataset', 'ADE20KDataset', 'COCOStuffDataset', 'ChaseDB1Dataset',
    'DarkZurichDataset', 'DRIVEDataset', 'FaceOccludedDataset', 'HRFDataset',
    'ISPRSDataset', 'LoveDADataset', 'NightDrivingDataset',
    'PascalContextDataset', 'PascalContextDataset59', 'PascalVOCDataset',
    'PotsdamDataset', 'STAREDataset', 'iSAIDDataset'
]
