"""Registry parity vs the reference: every component name the reference
registers (so every ``type='X'`` a reference user config can contain) must
resolve here. Lists extracted from the reference's ``__init__.py`` imports +
``@*.register_module()`` decorations (AST walk over
``/root/reference/mmseg/*``); reference ``__all__`` entries that are stale
(e.g. 'SwinUnet' — the decorated class is ``SwinUNet``) follow the
decorated name, since that is what configs resolve against."""
import pytest

# @HEADS-decorated classes in files imported by the reference
# mmseg/models/decode_heads/__init__.py (KernelUpdator additionally appears
# in the reference __all__ and is registered here too)
REFERENCE_HEADS = [
    'ANNHead', 'APCHead', 'ASPPHead', 'CARUnet', 'CCHead', 'DAHead',
    'DC_Unet', 'DMHead', 'DNLHead', 'DPTHead', 'DepthwiseSeparableASPPHead',
    'DepthwiseSeparableFCNHead', 'EMAHead', 'EncHead', 'FCNHead', 'FPNHead',
    'GCHead', 'ISAHead', 'IterativeDecodeHead', 'KernelUpdateHead',
    'KernelUpdator', 'LRASPPHead', 'LinkNet', 'MaxViTDecoder',
    'MultiResUnet', 'NLHead', 'OCRHead', 'PSAHead', 'PSPHead', 'PointHead',
    'ResUNet', 'SETRMLAHead', 'SETRUPHead', 'STDCHead', 'SegformerHead',
    'SegmenterMaskTransformerHead', 'SwinUNet', 'TransUNet', 'UPerHead',
    'UnetHead', 'UnetPlusPlus',
]

# reference mmseg/models/backbones/__init__.py __all__
REFERENCE_BACKBONES = [
    'BEiT', 'BiSeNetV1', 'BiSeNetV2', 'CGNet', 'ClsResNet18', 'ERFNet',
    'FastSCNN', 'HRNet', 'ICNet', 'MAE', 'MaxViT', 'MixVisionTransformer',
    'MobileNetV2', 'MobileNetV3', 'PCPVT', 'ResNeSt', 'ResNeXt', 'ResNet',
    'ResNetV1c', 'ResNetV1d', 'STDCContextPathNet', 'STDCNet', 'SVT',
    'Self_Define_Backbone', 'SwinTransformer', 'TIMMBackbone', 'UNet',
    'UnetBackbone', 'VisionTransformer',
]

REFERENCE_NECKS = ['FPN', 'Feature2Pyramid', 'ICNeck', 'JPU', 'MLANeck',
                   'MultiLevelNeck']

REFERENCE_LOSS_CLASSES = ['CrossEntropyLoss', 'DiceLoss', 'FocalLoss',
                          'IOULoss', 'L1Loss', 'LovaszLoss', 'TverskyLoss']

REFERENCE_SEGMENTORS = ['CascadeEncoderDecoder', 'EncoderDecoder',
                        'EncoderDecoderFull']

# reference mmseg/datasets/__init__.py __all__ (class entries)
REFERENCE_DATASETS = [
    'ADE20KDataset', 'COCOStuffDataset', 'ChaseDB1Dataset',
    'CityscapesDataset', 'ConcatDataset', 'CustomDataset', 'DRIVEDataset',
    'DarkZurichDataset', 'FaceOccludedDataset', 'HRFDataset', 'ISPRSDataset',
    'LoveDADataset', 'MultiImageMixDataset', 'MyDataset',
    'NightDrivingDataset', 'PascalContextDataset', 'PascalContextDataset59',
    'PascalVOCDataset', 'PotsdamDataset', 'RepeatDataset', 'STAREDataset',
    'iSAIDDataset',
]

# reference mmseg/datasets/pipelines/__init__.py __all__ (op entries)
REFERENCE_PIPELINE_OPS = [
    'AdjustGamma', 'CLAHE', 'Collect', 'ImageToTensor', 'LoadAnnotations',
    'LoadImageFromFile', 'MultiScaleFlipAug', 'Normalize', 'Pad',
    'PhotoMetricDistortion', 'RGB2Gray', 'RandomCrop', 'RandomCutOut',
    'RandomFlip', 'RandomMosaic', 'RandomRotate', 'Rerange', 'Resize',
    'SegRescale', 'ToDataContainer', 'ToTensor', 'Transpose',
]


def _missing(registry, names):
    return [n for n in names if n not in registry]


def test_heads_registry_superset():
    from stc_unet_tpu.models.builder import HEADS
    assert _missing(HEADS, REFERENCE_HEADS) == []


def test_backbones_registry_superset():
    from stc_unet_tpu.models.builder import BACKBONES
    assert _missing(BACKBONES, REFERENCE_BACKBONES) == []


def test_necks_registry_superset():
    from stc_unet_tpu.models.builder import NECKS
    assert _missing(NECKS, REFERENCE_NECKS) == []


def test_losses_registry_superset():
    from stc_unet_tpu.models.builder import LOSSES
    assert _missing(LOSSES, REFERENCE_LOSS_CLASSES) == []


def test_segmentors_registry_superset():
    from stc_unet_tpu.models.builder import SEGMENTORS
    assert _missing(SEGMENTORS, REFERENCE_SEGMENTORS) == []


def test_datasets_registry_superset():
    from stc_unet_tpu.datasets.builder import DATASETS
    assert _missing(DATASETS, REFERENCE_DATASETS) == []


def test_pipelines_registry_superset():
    from stc_unet_tpu.datasets.builder import PIPELINES
    assert _missing(PIPELINES, REFERENCE_PIPELINE_OPS) == []


def test_loss_functional_surface():
    """The reference also exports functional losses — name-parity at the
    package level (``mmseg.models.losses``)."""
    import stc_unet_tpu.models.losses as L
    for fn in ['accuracy', 'cross_entropy', 'binary_cross_entropy',
               'reduce_loss', 'weight_reduce_loss', 'weighted_loss']:
        assert hasattr(L, fn), fn


def test_module_surface_name_parity():
    """Every name in the reference's core/ops/utils/apis __all__ resolves
    under the same module path here (so ``from mmseg.core.evaluation import
    DistEvalHook``-style reference user code imports verbatim)."""
    import importlib
    surfaces = {
        'core': ['OPTIMIZER_BUILDERS', 'build_optimizer',
                 'build_optimizer_constructor'],
        'core.evaluation': ['DistEvalHook', 'EvalHook', 'eval_metrics',
                            'get_classes', 'get_palette',
                            'intersect_and_union', 'mean_dice',
                            'mean_fscore', 'mean_iou',
                            'pre_eval_to_metrics'],
        'core.seg': ['BasePixelSampler', 'OHEMPixelSampler',
                     'build_pixel_sampler'],
        'core.utils': ['add_prefix', 'check_dist_init', 'sync_random_seed'],
        'ops': ['Encoding', 'Upsample', 'resize'],
        'utils': ['build_ddp', 'build_dp', 'collect_env',
                  'find_latest_checkpoint', 'get_device', 'get_root_logger',
                  'setup_multi_processes'],
        'apis': ['get_root_logger', 'inference_segmentor',
                 'init_random_seed', 'init_segmentor', 'multi_gpu_test',
                 'set_random_seed', 'show_result_pyplot', 'single_gpu_test',
                 'train_segmentor'],
    }
    missing = []
    for mod, names in surfaces.items():
        m = importlib.import_module(f'stc_unet_tpu.{mod}')
        missing += [f'{mod}.{n}' for n in names if not hasattr(m, n)]
    assert missing == []
