"""Lightweight HTTP inference server (≙ reference ``docker/serve`` +
``tools/torchserve/mmseg_handler.py:14``: initialize / preprocess /
inference / postprocess, rebuilt without the torchserve dependency).

    python tools/serve/serve_model.py CONFIG CHECKPOINT --port 8080

POST an image (raw bytes) to /predictions → PNG label mask back.
"""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.dirname(_osp.abspath(__file__))))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse
import io
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np


class MMsegHandler:
    """initialize/preprocess/inference/postprocess protocol
    (≙ reference ``mmseg_handler.py``)."""

    def initialize(self, config, checkpoint):
        from stc_unet_tpu.apis import init_segmentor
        self.model = init_segmentor(config, checkpoint)

    def preprocess(self, data: bytes):
        import cv2
        arr = np.frombuffer(data, np.uint8)
        img = cv2.imdecode(arr, cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError('could not decode image payload')
        return img

    def inference(self, img):
        from stc_unet_tpu.apis import inference_segmentor
        return inference_segmentor(self.model, img)

    def postprocess(self, result) -> bytes:
        from PIL import Image
        mask = np.asarray(result[0]).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(mask).save(buf, format='PNG')
        return buf.getvalue()


class ServeRequestHandler(BaseHTTPRequestHandler):
    """GET /ping|/health → status json; POST (raw image bytes) → PNG mask.

    The bound :class:`MMsegHandler` lives on the server object
    (``server.mmseg_handler``) so the class is importable and testable
    (≙ reference ``tools/torchserve/test_torchserve.py``).
    """

    def log_message(self, *args):  # quiet by default; tests capture codes
        pass

    def do_GET(self):
        if self.path in ('/ping', '/health'):
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b'{"status": "Healthy"}')
        else:
            self.send_response(404)
            self.end_headers()

    def do_POST(self):
        handler = self.server.mmseg_handler
        try:
            length = int(self.headers.get('Content-Length', 0))
            data = self.rfile.read(length)
            img = handler.preprocess(data)
            result = handler.inference(img)
            payload = handler.postprocess(result)
            self.send_response(200)
            self.send_header('Content-Type', 'image/png')
            self.end_headers()
            self.wfile.write(payload)
        except Exception as e:
            self.send_response(500)
            self.end_headers()
            self.wfile.write(str(e).encode())


def make_server(handler: MMsegHandler, host: str = '0.0.0.0',
                port: int = 8080) -> HTTPServer:
    """Build the HTTP server (port 0 → ephemeral, for tests)."""
    server = HTTPServer((host, port), ServeRequestHandler)
    server.mmseg_handler = handler
    return server


def main():
    parser = argparse.ArgumentParser(description='Serve a segmentor')
    parser.add_argument('config')
    parser.add_argument('checkpoint')
    parser.add_argument('--host', default='0.0.0.0')
    parser.add_argument('--port', type=int, default=8080)
    args = parser.parse_args()

    handler = MMsegHandler()
    handler.initialize(args.config, args.checkpoint)
    server = make_server(handler, args.host, args.port)
    print(f'serving on {args.host}:{args.port}')
    server.serve_forever()


if __name__ == '__main__':
    main()
