"""Generate PASCAL-Context 60-class masks from trainval_merged.json
(≙ reference ``tools/convert_datasets/pascal_context.py``).

Requires the ``detail`` API package (same hard dependency as the
reference script); exits with instructions when it is absent.
"""
from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np
from PIL import Image

# the 59 foreground raw ids + 0, sorted; position in the sorted list is the
# trainId (same table the reference uses — it is the public 60-class subset)
RAW_IDS = sorted([
    0, 2, 259, 260, 415, 324, 9, 258, 144, 18, 19, 22, 23, 397, 25, 284,
    158, 159, 416, 33, 162, 420, 454, 295, 296, 427, 44, 45, 46, 308, 59,
    440, 445, 31, 232, 65, 354, 424, 68, 326, 72, 458, 34, 207, 80, 355,
    85, 347, 220, 349, 360, 98, 187, 104, 105, 366, 189, 368, 113, 115
])


def class_to_index(mask: np.ndarray) -> np.ndarray:
    mapping = np.asarray(RAW_IDS)
    index = np.digitize(mask.ravel(), mapping, right=True)
    return index.astype(np.uint8).reshape(mask.shape)


def main():
    parser = argparse.ArgumentParser(
        description='Convert PASCAL-Context annotations to indexed masks')
    parser.add_argument('devkit_path', help='VOCdevkit path')
    parser.add_argument('json_path', help='trainval_merged.json path')
    parser.add_argument('-o', '--out_dir', help='output path')
    args = parser.parse_args()

    try:
        from detail import Detail
    except ImportError:
        raise SystemExit(
            'pascal_context.py needs the "detail" API '
            '(https://github.com/zhanghang1989/detail-api) to decode '
            'trainval_merged.json — install it in an environment with '
            'network access and rerun.')

    out_dir = args.out_dir or osp.join(args.devkit_path, 'VOC2010',
                                       'SegmentationClassContext')
    img_dir = osp.join(args.devkit_path, 'VOC2010', 'JPEGImages')
    list_dir = osp.join(args.devkit_path, 'VOC2010', 'ImageSets',
                        'SegmentationContext')
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(list_dir, exist_ok=True)

    for phase in ('train', 'val'):
        detail = Detail(args.json_path, img_dir, phase)
        names = []
        for img_meta in detail.getImgs():
            mask = class_to_index(detail.getMask(img_meta))
            fname = img_meta['file_name']
            Image.fromarray(mask).save(
                osp.join(out_dir, fname.replace('jpg', 'png')))
            names.append(osp.splitext(osp.basename(fname))[0])
        with open(osp.join(list_dir, f'{phase}.txt'), 'w') as f:
            f.writelines(n + '\n' for n in sorted(names))
        print(f'{phase}: {len(names)} masks')
    print('Done!')


if __name__ == '__main__':
    main()
