"""KiTS19 Dice/mIoU checkpoint-parity evidence at REAL geometry.

BASELINE.json's parity axis: "KiTS19 Dice/mIoU parity within 0.1%". The
reference side cannot run here (mmcv absent), so the oracle is the shared
torch STC-UNet fixture (``tests/fixtures/torch_stc_unet.py`` — same module
layout as the fork's model classes) executed with torch-cpu through the same
preprocessing the config prescribes, with Dice/IoU computed by the same
formulas the reference uses (intersect/union area accumulation).

Pipeline proven end-to-end:
  torch weights → torch.save .pth → convert_torch_checkpoint → .ckpt →
  ``tools/test.py`` (the real CLI, fork argv) on a pseudo-KiTS fixture →
  metric json — compared against the torch-side eval of the same images.

Usage (CPU by default so it never contends with the TPU):
    python tools/parity_eval.py --out PARITY_KITS.json \
        [--width full|tiny] [--num-images 4] [--size 512]
"""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
for p in (_repo,):
    if p not in _sys.path:
        _sys.path.insert(0, p)

import argparse
import json
import os
import runpy
import tempfile


def build_pseudo_kits(root: str, n: int, size: int):
    import numpy as np
    from PIL import Image
    os.makedirs(f'{root}/test/images', exist_ok=True)
    os.makedirs(f'{root}/test/labels', exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        img = rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
        # blobby binary labels (kidney/tumor-ish structure)
        yy, xx = np.mgrid[0:size, 0:size]
        cy, cx, r = rng.randint(size // 4, 3 * size // 4, 2).tolist() + \
            [rng.randint(size // 8, size // 3)]
        ann = (((yy - cy) ** 2 + (xx - cx) ** 2) < r * r).astype(np.uint8)
        Image.fromarray(img).save(f'{root}/test/images/case_{i:05d}.png')
        Image.fromarray(ann).save(f'{root}/test/labels/case_{i:05d}.png')


def torch_side_eval(tm, root: str, n: int, size: int, num_classes=2):
    """Reference-side oracle: torch forward + area-accumulated Dice/IoU
    (the reference's intersect_and_union math, ``mmseg/core/evaluation``)."""
    import numpy as np
    import torch
    from PIL import Image
    total_i = np.zeros(num_classes)
    total_u = np.zeros(num_classes)
    total_p = np.zeros(num_classes)
    total_l = np.zeros(num_classes)
    logits_all = []
    with torch.no_grad():
        for i in range(n):
            img = np.asarray(Image.open(
                f'{root}/test/images/case_{i:05d}.png'), np.float32)
            ann = np.asarray(Image.open(
                f'{root}/test/labels/case_{i:05d}.png'), np.int64)
            # test pipeline: to_rgb (already RGB via PIL), Normalize(0,1)
            x = torch.from_numpy(img.transpose(2, 0, 1))[None]
            logits = tm(x)[0].numpy()
            logits_all.append(logits)
            pred = logits.argmax(0)
            for c in range(num_classes):
                pi, li = pred == c, ann == c
                total_i[c] += (pi & li).sum()
                total_u[c] += (pi | li).sum()
                total_p[c] += pi.sum()
                total_l[c] += li.sum()
    iou = total_i / np.maximum(total_u, 1)
    dice = 2 * total_i / np.maximum(total_p + total_l, 1)
    return (dict(mIoU=float(np.nanmean(iou)), mDice=float(np.nanmean(dice))),
            logits_all)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--width', default='full', choices=['full', 'tiny'])
    ap.add_argument('--num-images', type=int, default=4)
    ap.add_argument('--size', type=int, default=512)
    ap.add_argument('--out', default='PARITY_KITS.json')
    ap.add_argument('--platform', default='cpu',
                    help="jax platform ('cpu' avoids TPU contention; "
                         "'' = default)")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update('jax_platforms', args.platform)

    import numpy as np
    import torch
    from tests.fixtures.torch_stc_unet import _TorchSTCUNet, \
        prefixed_state_dict

    if args.width == 'full':
        ch, dec = [64, 128, 256, 512], [1024, 512, 256, 128, 64]
    else:
        ch, dec = [4, 8, 16, 32], [64, 32, 16, 8, 4]

    work = tempfile.mkdtemp(prefix='parity_kits_')
    build_pseudo_kits(work, args.num_images, args.size)

    torch.manual_seed(0)
    tm = _TorchSTCUNet(stc=True, ch=ch, dec=dec).eval()
    with torch.no_grad():  # non-trivial BN stats
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
    print('torch-side eval (oracle)...')
    torch_metrics, _ = torch_side_eval(tm, work, args.num_images, args.size)
    print('torch:', torch_metrics)

    # torch.save → convert → .ckpt (the full user journey)
    pth = os.path.join(work, 'stc_unet.pth')
    torch.save(dict(state_dict=prefixed_state_dict(tm)), pth)
    from stc_unet_tpu.engine import save_checkpoint
    from stc_unet_tpu.models import build_segmentor
    from stc_unet_tpu.utils.torch_convert import convert_torch_checkpoint
    model = build_segmentor(dict(
        type='EncoderDecoder',
        backbone=dict(type='UnetBackbone', in_channels=3, channel_list=ch,
                      context_layer='kernelselect', transformer_block=True),
        decode_head=dict(type='UnetHead', se=True, num_classes=2,
                         channels=dec[4], decoder_channel=dec,
                         loss_decode=dict(type='CrossEntropyLoss'))))
    model.init_weights(seed=0, input_size=(64, 64))
    variables, report = convert_torch_checkpoint(torch.load(pth), model=model)
    ckpt = os.path.join(work, 'stc_unet_converted.ckpt')
    save_checkpoint(ckpt, variables, step=0, meta=dict(CLASSES=['bg', 'fg']))
    print(f'converted: {report}')

    # drive the real CLI (fork argv: positional data_root)
    cfg_overrides = []
    if args.width == 'tiny':
        cfg_overrides = [
            '--cfg-options',
            'model.backbone.channel_list=[4,8,16,32]',
            'model.decode_head.decoder_channel=[64,32,16,8,4]',
            'model.decode_head.channels=4']
    json_dir = os.path.join(work, 'metrics')
    _sys.argv = (['tools/test.py', f'{work}/test/images',
                  os.path.join(_repo, 'my_config', 'STC-UNet.py'), ckpt,
                  '--eval', 'mIoU', 'mDice', '--work-dir', json_dir]
                 + cfg_overrides)
    print('running tools/test.py', ' '.join(_sys.argv[1:]))
    runpy.run_path(os.path.join(_repo, 'tools', 'test.py'),
                   run_name='__main__')

    metric_files = sorted(os.listdir(json_dir))
    with open(os.path.join(json_dir, metric_files[-1])) as f:
        jax_metrics = json.load(f)['metric']
    deltas = {k: abs(float(jax_metrics[k]) - torch_metrics[k])
              for k in ('mIoU', 'mDice')}
    result = dict(
        width=args.width, num_images=args.num_images, size=args.size,
        torch=torch_metrics,
        jax={k: float(jax_metrics[k]) for k in ('mIoU', 'mDice')},
        abs_delta=deltas,
        parity_within_0p1pct=all(d <= 1e-3 for d in deltas.values()))
    with open(args.out, 'w') as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    assert result['parity_within_0p1pct'], 'Dice/mIoU parity > 0.1%!'


if __name__ == '__main__':
    main()
