"""Training-dynamics parity vs the torch oracle (VERDICT r2 item 3).

Runs N identical Adam steps in torch (the shared STC-UNet fixture,
``tests/fixtures/torch_stc_unet.py`` — same module layout as the reference
fork) and in this framework, from the same converted init and the same
fixed batches, f32 end-to-end, and asserts the per-step loss trajectories
and the post-training eval logits agree. This is the end-to-end check that
would catch a wrong BN momentum, gradient scale, or Adam epsilon placement
(reference train semantics: ``mmseg/models/segmentors/base.py:112-216`` +
mmcv OptimizerHook; BN semantics ``models/bricks.py:BatchNorm``).

The default lr is 1e-4: Adam normalizes updates by sqrt(v), so on
coordinates with ~0 gradient the update degenerates to +/-lr and
cross-framework f32 conv noise (~1e-6) can flip its sign — the final
params therefore agree only to O(steps*lr) on such coordinates, while
any REAL divergence (wrong BN momentum / grad scale / eps placement)
shows up as O(1) relative loss drift that the per-step rtol catches.

Dropout is disabled on both sides (the torch fixture carries none, and
parity across frameworks is undefined under independent RNG streams);
everything else — CE + Dice loss, BN running-stat updates, Adam — runs
exactly as in training.

Usage (CPU by default so it never contends with the TPU):
    python tools/parity_train.py --steps 8 --out PARITY_TRAIN.json \
        [--width tiny|full] [--size 64] [--batch 2] [--lr 1e-3]
"""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import argparse
import json


def torch_losses(logits, label, smooth=1, exponent=2):
    """Mirror of the reference head loss: CE ('loss_bce' in the config) +
    mmseg Dice (``losses/dice_loss.py:13-48`` formulas)."""
    import torch
    import torch.nn.functional as F
    ce = F.cross_entropy(logits, label)
    prob = logits.softmax(1)
    n, c = prob.shape[:2]
    onehot = F.one_hot(label.clamp(0, c - 1), c).permute(0, 3, 1, 2).float()
    total = 0
    for i in range(c):
        p = prob[:, i].reshape(n, -1)
        t = onehot[:, i].reshape(n, -1)
        num = (p * t).sum(1) * 2 + smooth
        den = (p ** exponent + t ** exponent).sum(1) + smooth
        total = total + (1 - num / den)
    dice = (total / c).mean()
    return ce, dice


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--width', default='tiny', choices=['tiny', 'full'])
    ap.add_argument('--size', type=int, default=64)
    ap.add_argument('--batch', type=int, default=2)
    ap.add_argument('--steps', type=int, default=8)
    ap.add_argument('--lr', type=float, default=1e-4)
    ap.add_argument('--out', default='PARITY_TRAIN.json')
    ap.add_argument('--platform', default='cpu')
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update('jax_platforms', args.platform)

    import jax
    import numpy as np
    import torch
    from tests.fixtures.torch_stc_unet import (_TorchSTCUNet,
                                               prefixed_state_dict)
    from stc_unet_tpu.core import build_optimizer_tx
    from stc_unet_tpu.engine import TrainState, make_train_step
    from stc_unet_tpu.models import build_segmentor
    from stc_unet_tpu.utils.torch_convert import convert_torch_checkpoint

    if args.width == 'full':
        ch, dec = [64, 128, 256, 512], [1024, 512, 256, 128, 64]
    else:
        ch, dec = [4, 8, 16, 32], [64, 32, 16, 8, 4]

    torch.manual_seed(0)
    tm = _TorchSTCUNet(stc=True, ch=ch, dec=dec).train()

    model = build_segmentor(dict(
        type='EncoderDecoder',
        backbone=dict(type='UnetBackbone', in_channels=3, channel_list=ch,
                      context_layer='kernelselect', transformer_block=True),
        decode_head=dict(type='UnetHead', se=True, num_classes=2,
                         channels=dec[4], decoder_channel=dec,
                         dropout_ratio=0.0,
                         loss_decode=[
                             dict(type='CrossEntropyLoss',
                                  use_sigmoid=False, loss_name='loss_bce',
                                  loss_weight=1.0),
                             dict(type='DiceLoss', loss_name='loss_dice',
                                  loss_weight=1.0)])))
    model.init_weights(seed=0, input_size=(32, 32))
    variables, _ = convert_torch_checkpoint(
        dict(state_dict=prefixed_state_dict(tm)), model=model)
    # deep copy: Tensor.numpy() aliases torch storage — without this the
    # torch optimizer's in-place updates would leak into the jax init
    variables = jax.tree_util.tree_map(lambda x: np.array(x, copy=True),
                                       variables)
    variables.setdefault('batch_stats', {})

    tx = build_optimizer_tx(dict(type='Adam', lr=args.lr,
                                 betas=(0.9, 0.999)))
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, donate=False)

    topt = torch.optim.Adam(tm.parameters(), lr=args.lr,
                            betas=(0.9, 0.999), eps=1e-8)

    rs = np.random.RandomState(0)
    batches = []
    for _ in range(args.steps):
        img = rs.rand(args.batch, args.size, args.size, 3).astype(np.float32)
        gt = (img.mean(-1) > 0.5).astype(np.int64)
        batches.append((img, gt))
    eval_img = rs.rand(args.batch, args.size, args.size,
                       3).astype(np.float32)

    rng = jax.random.PRNGKey(0)
    jl, tl = [], []
    for img, gt in batches:
        # torch (NCHW)
        topt.zero_grad()
        logits = tm(torch.from_numpy(img.transpose(0, 3, 1, 2)))
        ce, dice = torch_losses(logits, torch.from_numpy(gt))
        (ce + dice).backward()
        topt.step()
        tl.append(float((ce + dice).detach()))
        # jax (NHWC)
        state, log_vars = step(state, img, gt.astype(np.int32), rng)
        jl.append(float(log_vars['loss']))

    # post-training eval logits (running BN stats + updated params)
    tm.eval()
    with torch.no_grad():
        t_logits = tm(torch.from_numpy(
            eval_img.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    model.variables = state.variables
    j_logits = np.asarray(model.encode_decode(eval_img))

    step_rel = [abs(a - b) / max(abs(b), 1e-8) for a, b in zip(jl, tl)]
    logit_scale = float(np.abs(t_logits).max())
    dlogit = float(np.abs(j_logits - t_logits).max())
    result = dict(
        width=args.width, size=args.size, batch=args.batch,
        steps=args.steps, lr=args.lr,
        torch_loss=[round(v, 6) for v in tl],
        jax_loss=[round(v, 6) for v in jl],
        max_step_rel_delta=round(max(step_rel), 8),
        eval_logit_max_abs_delta=round(dlogit, 8),
        eval_logit_scale=round(logit_scale, 4),
        parity_rtol_1e3=bool(max(step_rel) <= 1e-3
                             and dlogit <= 1e-3 * max(logit_scale, 1.0)))
    with open(args.out, 'w') as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    assert result['parity_rtol_1e3'], 'training dynamics diverge from torch!'


if __name__ == '__main__':
    main()
