"""HTTP-serving entry test (≙ reference ``tools/torchserve/
test_torchserve.py:1`` — post an image, compare the returned mask with
direct ``inference_segmentor`` output; plus the health endpoint).

Runs the real HTTPServer on an ephemeral port in a thread — no network
mocking, the full request → preprocess → inference → postprocess path.
"""
import io
import os
import sys
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

MODEL = dict(
    type='EncoderDecoder',
    backbone=dict(type='UnetBackbone', in_channels=3,
                  channel_list=[4, 8, 8, 8]),
    decode_head=dict(type='UnetHead', num_classes=2, channels=4,
                     decoder_channel=[16, 16, 16, 16, 4],
                     loss_decode=dict(type='CrossEntropyLoss')))

TEST_PIPELINE = [
    dict(type='LoadImageFromFile'),
    dict(type='MultiScaleFlipAug', img_scale=(32, 32), flip=False,
         transforms=[
             dict(type='Resize', keep_ratio=False),
             dict(type='Normalize', mean=[0, 0, 0], std=[255, 255, 255],
                  to_rgb=True),
             dict(type='ImageToTensor', keys=['img']),
             dict(type='Collect', keys=['img']),
         ])
]


@pytest.fixture(scope='module')
def served(tmp_path_factory):
    from stc_unet_tpu.engine import save_checkpoint
    from stc_unet_tpu.models import build_segmentor
    from stc_unet_tpu.utils import Config
    from tools.serve.serve_model import MMsegHandler, make_server

    tmp = tmp_path_factory.mktemp('serve')
    cfg = Config(dict(model=MODEL, test_cfg=dict(mode='whole'),
                      data=dict(test=dict(pipeline=TEST_PIPELINE))))
    model = build_segmentor(cfg.model, test_cfg=cfg.test_cfg)
    variables = model.init_weights(seed=0)
    ckpt = str(tmp / 'm.ckpt')
    save_checkpoint(ckpt, variables,
                    meta=dict(CLASSES=['background', 'target'],
                              PALETTE=[[0, 0, 0], [1, 1, 1]]))
    handler = MMsegHandler()
    handler.initialize(cfg, ckpt)
    server = make_server(handler, host='127.0.0.1', port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f'http://127.0.0.1:{server.server_port}'
    yield url, handler
    server.shutdown()
    thread.join(timeout=5)


def test_health_endpoint(served):
    url, _ = served
    for path in ('/ping', '/health'):
        with urllib.request.urlopen(url + path, timeout=10) as r:
            assert r.status == 200
            assert b'Healthy' in r.read()
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(url + '/nope', timeout=10)
    assert exc.value.code == 404


def test_predictions_match_direct_inference(served):
    from stc_unet_tpu.apis import inference_segmentor
    url, handler = served
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format='PNG')
    req = urllib.request.Request(url + '/predictions', data=buf.getvalue(),
                                 method='POST')
    with urllib.request.urlopen(req, timeout=60) as r:
        assert r.status == 200
        assert r.headers['Content-Type'] == 'image/png'
        mask = np.asarray(Image.open(io.BytesIO(r.read())))
    assert mask.shape == (32, 32)
    # oracle: the same bytes through the direct python API (PNG encodes
    # RGB; the server decodes with cv2 → BGR, exactly like LoadImageFromFile)
    import cv2
    direct = inference_segmentor(
        handler.model, cv2.imdecode(np.frombuffer(buf.getvalue(), np.uint8),
                                    cv2.IMREAD_COLOR))
    np.testing.assert_array_equal(mask, np.asarray(direct[0]).astype(np.uint8))


def test_bad_payload_returns_500(served):
    url, _ = served
    req = urllib.request.Request(url + '/predictions', data=b'not an image',
                                 method='POST')
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=30)
    assert exc.value.code == 500
