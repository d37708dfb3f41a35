"""Frame-loop video inference demo (≙ reference ``demo/video_demo.py``)."""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse

import cv2


def main():
    parser = argparse.ArgumentParser(description='Video demo')
    parser.add_argument('video', help='video file or webcam id')
    parser.add_argument('config', help='config file')
    parser.add_argument('checkpoint', help='checkpoint file')
    parser.add_argument('--device', default=None)
    parser.add_argument('--palette', default='cityscapes')
    parser.add_argument('--show', action='store_true')
    parser.add_argument('--show-wait-time', default=1, type=int)
    parser.add_argument('--output-file', default=None, type=str)
    parser.add_argument('--output-fourcc', default='MJPG', type=str)
    parser.add_argument('--output-fps', default=-1, type=int)
    parser.add_argument('--output-height', default=-1, type=int)
    parser.add_argument('--output-width', default=-1, type=int)
    parser.add_argument('--opacity', type=float, default=0.5)
    args = parser.parse_args()

    from stc_unet_tpu.apis import inference_segmentor, init_segmentor
    from stc_unet_tpu.core import get_palette
    model = init_segmentor(args.config, args.checkpoint)

    cap = cv2.VideoCapture(
        int(args.video) if args.video.isdigit() else args.video)
    assert cap.isOpened()
    input_fps = cap.get(cv2.CAP_PROP_FPS)
    input_h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    input_w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))

    writer = None
    if args.output_file is not None:
        fourcc = cv2.VideoWriter_fourcc(*args.output_fourcc)
        fps = args.output_fps if args.output_fps > 0 else input_fps
        h = args.output_height if args.output_height > 0 else input_h
        w = args.output_width if args.output_width > 0 else input_w
        writer = cv2.VideoWriter(args.output_file, fourcc, fps, (w, h))

    try:
        while True:
            flag, frame = cap.read()
            if not flag:
                break
            result = inference_segmentor(model, frame)
            draw = model.show_result(frame, result,
                                     palette=get_palette(args.palette),
                                     opacity=args.opacity)
            if args.show:  # pragma: no cover
                cv2.imshow('video demo', draw)
                cv2.waitKey(args.show_wait_time)
            if writer:
                if draw.shape[0] != h or draw.shape[1] != w:
                    draw = cv2.resize(draw, (w, h))
                writer.write(draw)
    finally:
        if writer:
            writer.release()
        cap.release()


if __name__ == '__main__':
    main()
