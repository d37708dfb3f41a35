"""BaseSegmentor: the torch-like stateful wrapper around a flax net.

TPU-native re-architecture of reference ``mmseg/models/segmentors/base.py:13``.
The *compute* lives in a pure flax module (jitted, NHWC); this wrapper owns
the variables (params + batch_stats), the test-time protocol
(simple_test/aug_test dispatch, ``forward(return_loss=...)``), loss
aggregation (``_parse_losses``), and visualization — the parts of the
reference API that are inherently stateful/host-side.
"""
from __future__ import annotations

import os
from abc import ABCMeta, abstractmethod
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


class BaseSegmentor(metaclass=ABCMeta):
    """Base segmentor wrapper (reference ``base.py:13``)."""

    def __init__(self, init_cfg: Optional[dict] = None):
        self.init_cfg = init_cfg
        self.variables: Optional[Dict[str, Any]] = None
        self.fp16_enabled = False
        self.CLASSES = None
        self.PALETTE = None
        self.cfg = None
        self._jit_cache: Dict[Any, Any] = {}

    # -- capability flags (reference base.py:24-46) -------------------------
    @property
    def with_neck(self):
        return getattr(self, 'neck', None) is not None

    @property
    def with_auxiliary_head(self):
        return getattr(self, 'auxiliary_head', None) is not None

    @property
    def with_decode_head(self):
        return getattr(self, 'decode_head', None) is not None

    # -- abstract protocol ---------------------------------------------------
    @abstractmethod
    def extract_feat(self, imgs):
        pass

    @abstractmethod
    def encode_decode(self, img, img_metas):
        pass

    @abstractmethod
    def forward_train(self, img, img_metas, **kwargs):
        pass

    @abstractmethod
    def simple_test(self, img, img_meta, **kwargs):
        pass

    @abstractmethod
    def aug_test(self, imgs, img_metas, **kwargs):
        pass

    @abstractmethod
    def init_weights(self, seed: int = 0):
        pass

    # -- forward dispatch (reference base.py:62-110) -------------------------
    def forward_test(self, imgs, img_metas, **kwargs):
        """TTA dispatch: 1 aug → simple_test, N augs → aug_test."""
        for var, name in [(imgs, 'imgs'), (img_metas, 'img_metas')]:
            if not isinstance(var, list):
                raise TypeError(f'{name} must be a list, got {type(var)}')
        num_augs = len(imgs)
        if num_augs != len(img_metas):
            raise ValueError(
                f'num of augmentations ({len(imgs)}) != num of image meta '
                f'({len(img_metas)})')
        for img_meta in img_metas:
            ori_shapes = [_['ori_shape'] for _ in img_meta]
            assert all(shape == ori_shapes[0] for shape in ori_shapes)
            img_shapes = [_['img_shape'] for _ in img_meta]
            assert all(shape == img_shapes[0] for shape in img_shapes)
            pad_shapes = [_['pad_shape'] for _ in img_meta]
            assert all(shape == pad_shapes[0] for shape in pad_shapes)
        if num_augs == 1:
            return self.simple_test(imgs[0], img_metas[0], **kwargs)
        return self.aug_test(imgs, img_metas, **kwargs)

    def forward(self, img, img_metas=None, return_loss=True, **kwargs):
        """Train/test dispatch keyed on return_loss (reference base.py:97)."""
        if return_loss:
            return self.forward_train(img, img_metas, **kwargs)
        return self.forward_test(img, img_metas, **kwargs)

    def __call__(self, img=None, img_metas=None, return_loss=True, **kwargs):
        return self.forward(img, img_metas, return_loss=return_loss, **kwargs)

    # -- train/val steps (reference base.py:112-169) -------------------------
    def train_step(self, data_batch, optimizer=None, **kwargs):
        """Eager train-protocol step: compute losses + logs.

        Note: in this framework gradients/updates are applied by the
        functional engine (:mod:`stc_unet_tpu.engine`), not here — this
        method exists for API parity and eager experimentation.
        """
        losses = self(**data_batch)
        loss, log_vars = self._parse_losses(losses)
        return dict(loss=loss, log_vars=log_vars,
                    num_samples=len(data_batch['img_metas']))

    def val_step(self, data_batch, optimizer=None, **kwargs):
        losses = self(**data_batch)
        loss, log_vars = self._parse_losses(losses)
        return dict(loss=loss, log_vars=log_vars,
                    num_samples=len(data_batch['img_metas']))

    @staticmethod
    def _parse_losses(losses: dict):
        """Sum every ``*loss*`` entry into the total (reference base.py:171).

        The reference's cross-rank all_reduce of log vars is unnecessary
        under pjit (values are already global); kept as plain means here.
        """
        log_vars = {}
        for loss_name, loss_value in losses.items():
            if isinstance(loss_value, (list, tuple)):
                log_vars[loss_name] = sum(jnp.mean(v) for v in loss_value)
            else:
                log_vars[loss_name] = jnp.mean(loss_value)
        loss = sum(v for k, v in log_vars.items() if 'loss' in k)
        BaseSegmentor._check_loss_keys_consistent(log_vars)
        log_vars['loss'] = loss
        log_vars = {k: float(v) for k, v in log_vars.items()}
        return loss, log_vars

    @staticmethod
    def _check_loss_keys_consistent(log_vars, allgather=None,
                                    process_count=None, process_index=0):
        """Cross-host loss-key guard (reference ``base.py:198-205``).

        A log-var set that diverges across hosts would desynchronize every
        later collective (hosts would launch different programs) — fail
        fast with a readable message instead of hanging. ``allgather`` /
        ``process_count`` are injectable for unit tests.
        """
        if process_count is None:
            import jax
            if jax.process_count() <= 1:
                return
            from jax.experimental import multihost_utils
            allgather = multihost_utils.process_allgather
            process_count = jax.process_count()
            process_index = jax.process_index()
        lengths = np.asarray(allgather(np.asarray(len(log_vars))))
        total = int(np.asarray(lengths).sum())
        assert total == len(log_vars) * process_count, (
            'loss log variables are different across hosts!\n'
            f'process {process_index} len(log_vars): {len(log_vars)} '
            'keys: ' + ','.join(log_vars.keys()))

    # -- visualization (reference base.py:217-291) ---------------------------
    def show_result(self, img, result, palette=None, win_name='', show=False,
                    wait_time=0, out_file=None, opacity=0.5):
        """Overlay a seg map on the image with the class palette."""
        import cv2
        if isinstance(img, str):
            img = cv2.imread(img)
        img = np.ascontiguousarray(np.asarray(img))
        seg = np.asarray(result[0] if isinstance(result, list) else result)
        if palette is None:
            if self.PALETTE is None:
                rng = np.random.RandomState(42)
                palette = rng.randint(0, 255, size=(int(seg.max()) + 1, 3))
            else:
                palette = self.PALETTE
        palette = np.array(palette)
        assert palette.shape[1] == 3 and palette.ndim == 2
        assert 0 < opacity <= 1.0
        color_seg = np.zeros((seg.shape[0], seg.shape[1], 3), dtype=np.uint8)
        for label, color in enumerate(palette):
            color_seg[seg == label, :] = color
        color_seg = color_seg[..., ::-1]  # BGR
        out = (img * (1 - opacity) + color_seg * opacity).astype(np.uint8)
        if out_file is not None:
            # mmcv.imwrite auto-creates parent dirs — keep that contract
            os.makedirs(os.path.dirname(os.path.abspath(out_file)),
                        exist_ok=True)
            cv2.imwrite(out_file, out)
        if show:  # pragma: no cover
            cv2.imshow(win_name, out)
            cv2.waitKey(wait_time)
        if not (show or out_file):
            return out
        return None
