"""CLI tests for the analysis/publish tools (≙ reference
``tests/test_utils`` + manual tool checks): analyze_logs, confusion_matrix,
model_ensemble, publish_model, print_config driven end-to-end on tiny
fixtures via their real ``main()`` entry points."""
import json
import os
import os.path as osp
import runpy
import sys

import numpy as np
import pytest
from PIL import Image

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
TOOLS = osp.join(REPO, 'tools')


def _run_tool(name, argv):
    old = sys.argv
    sys.argv = [name] + [str(a) for a in argv]
    try:
        runpy.run_path(osp.join(TOOLS, name), run_name='__main__')
    finally:
        sys.argv = old


@pytest.fixture()
def tiny_cfg(tmp_path):
    """Tiny model + dataset config on generated data."""
    root = tmp_path / 'data'
    for sub in ('imgs', 'anns'):
        os.makedirs(root / sub, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3),
                                    dtype=np.uint8)).save(
            root / 'imgs' / f'{i}.png')
        Image.fromarray(rng.randint(0, 2, (32, 32)).astype(np.uint8)).save(
            root / 'anns' / f'{i}.png')
    cfg = tmp_path / 'cfg.py'
    cfg.write_text(f'''
model = dict(
    type='EncoderDecoder',
    backbone=dict(type='UnetBackbone', in_channels=3,
                  channel_list=[4, 8, 8, 8]),
    decode_head=dict(type='UnetHead', num_classes=2, channels=4,
                     decoder_channel=[16, 16, 16, 16, 4],
                     loss_decode=dict(type='CrossEntropyLoss')),
    test_cfg=dict(mode='whole'))
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='MultiScaleFlipAug', img_scale=(32, 32), flip=False,
         transforms=[
             dict(type='Resize', keep_ratio=False),
             dict(type='Normalize', mean=[0, 0, 0], std=[255, 255, 255],
                  to_rgb=True),
             dict(type='ImageToTensor', keys=['img']),
             dict(type='Collect', keys=['img'])])]
data = dict(
    samples_per_gpu=1, workers_per_gpu=0,
    test=dict(type='MyDataset', data_root='{root}', img_dir='imgs',
              ann_dir='anns', pipeline=test_pipeline, test_mode=True))
''')
    return str(cfg)


def test_analyze_logs_curve_and_time(tmp_path, capsys):
    log = tmp_path / 'run.log.json'
    lines = [dict(env_info='x')]
    for it in range(1, 7):
        lines.append(dict(mode='train', epoch=1, iter=it, lr=0.01,
                          time=0.1 + it * 0.01, data_time=0.01,
                          memory=1, loss=1.0 / it))
    lines.append(dict(mode='val', epoch=1, iter=6, lr=0.01, mIoU=0.5,
                      mAcc=0.6, aAcc=0.7))
    log.write_text('\n'.join(json.dumps(d) for d in lines))
    out_png = tmp_path / 'curve.png'
    _run_tool('analyze_logs.py',
              ['plot_curve', str(log), '--keys', 'loss', '--out',
               str(out_png), '--backend', 'Agg'])
    assert out_png.exists()
    _run_tool('analyze_logs.py', ['cal_train_time', str(log)])
    assert 'average iter time' in capsys.readouterr().out


def test_confusion_matrix(tiny_cfg, tmp_path):
    # prediction pickle: list of (H, W) label maps aligned to the dataset
    import pickle
    preds = [np.zeros((32, 32), np.int64) for _ in range(2)]
    pred_path = tmp_path / 'preds.pkl'
    with open(pred_path, 'wb') as f:
        pickle.dump(preds, f)
    save_dir = tmp_path / 'cm'
    _run_tool('confusion_matrix.py', [tiny_cfg, pred_path, save_dir])
    assert (save_dir / 'confusion_matrix.png').exists()


def test_print_config(tiny_cfg, capsys):
    _run_tool('print_config.py', [tiny_cfg])
    out = capsys.readouterr().out
    assert 'EncoderDecoder' in out and 'UnetHead' in out


def test_publish_model(tmp_path):
    from stc_unet_tpu.engine import load_checkpoint, save_checkpoint
    from stc_unet_tpu.models import build_segmentor
    model = build_segmentor(dict(
        type='EncoderDecoder',
        backbone=dict(type='UnetBackbone', in_channels=3,
                      channel_list=[4, 8, 8, 8]),
        decode_head=dict(type='UnetHead', num_classes=2, channels=4,
                         decoder_channel=[16, 16, 16, 16, 4],
                         loss_decode=dict(type='CrossEntropyLoss'))))
    model.init_weights(seed=0)
    in_file = tmp_path / 'in.ckpt'
    out_file = tmp_path / 'out.ckpt'
    save_checkpoint(str(in_file), model.variables, step=3,
                    meta=dict(optimizer='stripme'))
    _run_tool('publish_model.py', [in_file, out_file])
    published = [p for p in os.listdir(tmp_path) if p.startswith('out')]
    assert published, 'publish_model wrote no hashed artifact'
    # published checkpoint still loads
    load_checkpoint(model, str(tmp_path / published[0]))


def test_model_ensemble(tiny_cfg, tmp_path):
    from stc_unet_tpu.engine import save_checkpoint
    from stc_unet_tpu.models import build_segmentor
    from stc_unet_tpu.utils import Config
    cfg = Config.fromfile(tiny_cfg)
    ckpts = []
    for seed in (0, 1):
        model = build_segmentor(cfg.model)
        model.init_weights(seed=seed)
        p = tmp_path / f'm{seed}.ckpt'
        save_checkpoint(str(p), model.variables, step=1)
        ckpts.append(str(p))
    out_dir = tmp_path / 'ens'
    _run_tool('model_ensemble.py',
              ['--config', tiny_cfg, tiny_cfg,
               '--checkpoint', ckpts[0], ckpts[1], '--out', out_dir])
    outs = os.listdir(out_dir)
    assert len(outs) == 2  # one prediction map per image


def test_deployment_entries_export_and_verify(tiny_cfg, tmp_path):
    """pytorch2onnx / pytorch2torchscript (reference argv) delegate to the
    AOT exporter and emit a runnable StableHLO artifact with --verify."""
    out = tmp_path / 'm.stablehlo'
    _run_tool('pytorch2onnx.py', [tiny_cfg, '--shape', 16, 16,
                                  '--output-file', out, '--verify'])
    text = out.read_text()
    assert 'stablehlo' in text or 'module' in text
    out2 = tmp_path / 'm2.stablehlo'
    _run_tool('pytorch2torchscript.py', [tiny_cfg, '--shape', 16, 16,
                                         '--output-file', out2])
    assert out2.exists()


def test_benchmark_cli(tiny_cfg, capsys):
    _run_tool('benchmark.py', [tiny_cfg, '--total-iters', 3,
                               '--warmup-iters', 1, '--log-interval', 2])
    out = capsys.readouterr().out
    assert 'fps' in out.lower() or 'img / s' in out.lower() or \
        'img/s' in out.lower()


def test_get_flops_cli(tiny_cfg, capsys):
    _run_tool('get_flops.py', [tiny_cfg, '--shape', 32, 32])
    out = capsys.readouterr().out
    assert 'Flops' in out or 'GFLOPs' in out or 'flops' in out.lower()
    assert 'arams' in out  # Params/params


def test_test_cli_aug_test_and_show_dir(tiny_cfg, tmp_path, monkeypatch):
    """tools/test.py end-to-end (fork argv: data_root config ckpt) with
    --aug-test multi-scale+flip TTA and --show-dir output."""
    from stc_unet_tpu.engine import save_checkpoint
    from stc_unet_tpu.models import build_segmentor
    from stc_unet_tpu.utils import Config
    cfg = Config.fromfile(tiny_cfg)
    model = build_segmentor(cfg.model)
    model.init_weights(seed=0)
    ckpt = tmp_path / 'm.ckpt'
    save_checkpoint(str(ckpt), model.variables, step=1,
                    meta=dict(CLASSES=['bg', 'fg'],
                              PALETTE=[[0, 0, 0], [255, 0, 0]]))
    data_root = cfg.data.test['data_root']
    monkeypatch.chdir(tmp_path)
    show_dir = tmp_path / 'vis'
    _run_tool('test.py', [f'{data_root}/imgs', tiny_cfg, ckpt,
                          '--eval', 'mDice', '--aug-test',
                          '--show-dir', show_dir,
                          '--work-dir', tmp_path / 'wd'])
    assert any(f.endswith('.png') for f in os.listdir(show_dir))
    metrics = [f for f in os.listdir(tmp_path / 'wd') if f.endswith('.json')]
    assert metrics


def test_browse_dataset_cli(tiny_cfg, tmp_path):
    """browse_dataset renders train-pipeline samples to --output-dir."""
    from stc_unet_tpu.utils import Config
    cfg = Config.fromfile(tiny_cfg)
    # give the config a train split (reuses the test data dir)
    train = dict(cfg.data.test)
    train.pop('test_mode', None)
    train['pipeline'] = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations'),
        dict(type='Resize', img_scale=(32, 32), keep_ratio=False),
        dict(type='RandomFlip', prob=0.0),
        dict(type='Normalize', mean=[0, 0, 0], std=[255, 255, 255],
             to_rgb=True),
        dict(type='DefaultFormatBundle'),
        dict(type='Collect', keys=['img', 'gt_semantic_seg']),
    ]
    cfg.data['train'] = train
    cfg_path = tmp_path / 'browse_cfg.py'
    cfg_path.write_text(cfg.pretty_text if hasattr(cfg, 'pretty_text')
                        else repr({k: cfg[k] for k in cfg.keys()}))
    out = tmp_path / 'browse_out'
    try:
        _run_tool('browse_dataset.py', [cfg_path, '--output-dir', out,
                                        '--show-number', 2])
    except SystemExit as e:  # some tools sys.exit(0) at the end
        assert not e.code
    rendered = list(out.rglob('*.png')) + list(out.rglob('*.jpg'))
    assert rendered, f'no rendered samples in {out}'
