"""Zoo forward tier (VERDICT r2 item 6): one representative leaf config
per family, forward-smoked — ``forward_train`` must produce a finite loss
and ``simple_test`` the right shape. Catches head/backbone wiring bugs the
build-only sweep (``test_config_zoo.py``) cannot.

Runs the REAL configured architectures (no channel shrinking — that is
what the build sweep covers) at a small input size chosen per family, so
this tier is slow-ish (~min on CPU); it is its own pytest file to slot
into the documented 3-way suite split (CLAUDE.md).
"""
import glob
import os.path as osp

import numpy as np
import pytest

from stc_unet_tpu.models import build_segmentor
from stc_unet_tpu.utils import Config

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

# family dir → (leaf basename fragment or None for first, input size,
#               extra cfg-surgery dict paths)
# Size must satisfy the family's divisibility constraints (patch/window).
SIZE_OVERRIDES = {
    'beit': 128,          # 16-patch + rel-pos window geometry
    'mae': 128,
    'vit': 128,
    'setr': 128,
    'segmenter': 128,
    'dpt': 128,
    'swin': 64,
    'twins': 64,
    'segformer': 64,
    'knet': 64,
    'maxvit': 64,
    'stc_unet': 64,
}
# families whose first-alphabetical leaf is outsized; pick a smaller one
LEAF_PICK = {
    'beit': 'upernet_beit-base_8x2_640x640_160k_ade20k.py',
    'swin': 'upernet_swin_tiny_patch4_window7_512x512_160k_ade20k_'
            'pretrain_224x224_1K.py',
    'vit': 'upernet_vit-b16_mln_512x512_80k_ade20k.py',
    'twins': 'twins_pcpvt-s_fpn_fpnhead_8x4_512x512_80k_ade20k.py',
    'resnest': 'fcn_s101-d8_512x512_160k_ade20k.py',
    'convnext': 'upernet_convnext_tiny_fp16_512x512_160k_ade20k.py',
    'poolformer': 'fpn_poolformer_s12_8x4_40k_ade20k.py',
}


def _families():
    fams = {}
    for d in sorted(glob.glob(osp.join(REPO, 'configs', '*'))):
        name = osp.basename(d)
        if not osp.isdir(d) or name == '_base_':
            continue
        leafs = sorted(glob.glob(osp.join(d, '*.py')))
        if not leafs:
            continue
        pick = LEAF_PICK.get(name)
        if pick:
            match = [f for f in leafs if osp.basename(f) == pick]
            leafs = match or leafs
        fams[name] = leafs[0]
    # the author's experiment configs: every one is its own family
    for f in sorted(glob.glob(osp.join(REPO, 'my_config', '*.py'))):
        if not osp.basename(f).startswith('_base'):
            fams[f'my_config/{osp.splitext(osp.basename(f))[0]}'] = f
    return fams


FAMILIES = _families()


def test_family_coverage():
    assert len(FAMILIES) >= 45, sorted(FAMILIES)


def _maxvit_small_windows(model_cfg):
    # stride-32 features at the 64² probe are 2×2 — shrink the 8×8
    # block/grid windows to a legal geometry (same attention code path)
    for part in ('backbone', 'decode_head'):
        if isinstance(model_cfg.get(part), dict) and \
                'grid_window_size' in model_cfg[part]:
            model_cfg[part]['grid_window_size'] = (2, 2)


# family → cfg-surgery hook applied before build (geometry-legal probes)
SURGERY = {
    'my_config/maxvit-unet': _maxvit_small_windows,
}


def _strip_pretrained(d):
    if isinstance(d, dict):
        if d.get('pretrained') is not None:
            d['pretrained'] = None
        ic = d.get('init_cfg')
        if isinstance(ic, dict) and ic.get('type') == 'Pretrained':
            d['init_cfg'] = None
        if isinstance(ic, list):
            d['init_cfg'] = [c for c in ic
                             if not (isinstance(c, dict)
                                     and c.get('type') == 'Pretrained')]
        for v in d.values():
            _strip_pretrained(v)
    elif isinstance(d, (list, tuple)):
        for v in d:
            _strip_pretrained(v)


@pytest.mark.parametrize('family', sorted(FAMILIES),
                         ids=sorted(FAMILIES))
def test_zoo_family_forward(family):
    cfg_file = FAMILIES[family]
    cfg = Config.fromfile(cfg_file)
    model_cfg = dict(cfg.model)
    _strip_pretrained(model_cfg)
    fam_key = family.split('/')[0].lower()
    size = SIZE_OVERRIDES.get(fam_key, 64)
    surgery = SURGERY.get(family.lower())
    if surgery:
        surgery(model_cfg)
    # whole-mode at the probe size (slide cfgs may have larger crops)
    model_cfg['test_cfg'] = dict(mode='whole')
    model = build_segmentor(model_cfg)
    model.init_weights(seed=0, input_size=(size, size))

    rng = np.random.RandomState(0)
    img = rng.rand(1, size, size, 3).astype(np.float32)
    num_classes = model.num_classes
    gt = rng.randint(0, max(num_classes, 2),
                     (1, size, size)).astype(np.int32)

    losses = model.forward_train(img, None, gt)
    loss_vals = [float(np.asarray(v).mean()) for k, v in losses.items()
                 if 'loss' in k]
    assert loss_vals, f'{family}: no loss keys in {sorted(losses)}'
    assert all(np.isfinite(v) for v in loss_vals), \
        f'{family}: non-finite loss {dict(zip(sorted(losses), loss_vals))}'

    metas = [dict(ori_shape=(size, size, 3), img_shape=(size, size, 3),
                  pad_shape=(size, size, 3), scale_factor=1.0, flip=False)]
    pred = model.simple_test(img, metas)
    assert np.asarray(pred[0]).shape == (size, size)
