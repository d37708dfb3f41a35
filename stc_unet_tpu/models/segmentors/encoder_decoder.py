"""EncoderDecoder segmentor (≙ reference ``segmentors/encoder_decoder.py:14``).

Architecture: a pure flax net (:class:`EncoderDecoderNet`) that XLA compiles
once per input shape, wrapped by a stateful :class:`EncoderDecoder` that
implements the reference's inference protocol.

TPU-native slide inference (reference ``encoder_decoder.py:157-203``): the
data-dependent python crop loop becomes ONE compiled program — all tiles are
gathered with static offsets, batched along a tile axis (so the conv work
hits the MXU as one big batch), run through the net, and scatter-added back
with the overlap count matrix baked in as a constant.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from stc_unet_tpu.core.utils import add_prefix
from stc_unet_tpu.ops import resize
from .. import builder
from ..builder import SEGMENTORS
from .base import BaseSegmentor


class EncoderDecoderNet(nn.Module):
    """The pure compute graph: backbone → (neck) → head(s)."""
    backbone: nn.Module
    decode_head: nn.Module
    neck: Optional[nn.Module] = None
    auxiliary_head: Optional[Tuple[nn.Module, ...]] = None
    align_corners: bool = False

    def extract(self, img, train: bool = False):
        x = self.backbone(img, train=train)
        if self.neck is not None:
            x = self.neck(x, train=train)
        return x

    def __call__(self, img, train: bool = False):
        """encode_decode: logits resized to the input size
        (reference ``encoder_decoder.py:71-82``)."""
        x = self.extract(img, train=train)
        out = self.decode_head(x, train=train)
        if isinstance(out, tuple):
            # heads with auxiliary outputs (e.g. EncHead se-loss) expose the
            # dense logits first (≙ reference EncHead.forward_test → [0])
            out = out[0]
        out = resize(out, size=img.shape[1:3], mode='bilinear',
                     align_corners=self.align_corners, warning=False)
        return out

    def forward_heads(self, img, train: bool = True):
        """Raw logits per head, for the training loss path."""
        x = self.extract(img, train=train)
        outs = {'decode': self.decode_head(x, train=train)}
        if self.auxiliary_head is not None:
            for i, head in enumerate(self.auxiliary_head):
                outs[f'aux_{i}'] = head(x, train=train)
        return outs


@SEGMENTORS.register_module()
class EncoderDecoder(BaseSegmentor):
    """Main segmentor: backbone → (neck) → decode_head (+ aux heads)."""

    def __init__(self, backbone, decode_head, neck=None, auxiliary_head=None,
                 train_cfg=None, test_cfg=None, pretrained=None,
                 init_cfg=None):
        super().__init__(init_cfg)
        if pretrained is not None:
            assert backbone.get('pretrained') is None, \
                'both backbone and segmentor set pretrained weight'
            backbone = dict(backbone)
            backbone['pretrained'] = pretrained
        self.backbone_cfg = dict(backbone)
        self.backbone = builder.build_backbone(backbone)
        self.neck = builder.build_neck(neck) if neck is not None else None
        self._init_decode_head(decode_head)
        self._init_auxiliary_head(auxiliary_head)
        self.train_cfg = train_cfg
        self.test_cfg = test_cfg or {}
        assert self.with_decode_head
        self.net = EncoderDecoderNet(
            backbone=self.backbone, decode_head=self.decode_head,
            neck=self.neck, auxiliary_head=self.auxiliary_head,
            align_corners=self.align_corners)
        self._rng = jax.random.PRNGKey(0)
        self.mesh = None  # set via set_mesh() to shard inference

    def set_mesh(self, mesh):
        """Shard inference over a device mesh.

        - 'data' axis: whole-mode batches and slide tiles split along it
          (the spatial-tile axis is this workload's sequence parallelism —
          SURVEY.md §5).
        - 'spatial' axis (optional, 2-D mesh): whole-mode images are
          additionally sharded along H — XLA GSPMD inserts the conv halo
          exchanges over ICI automatically, letting one image larger than a
          chip's HBM span multiple chips (CT whole-slice inference).
        """
        self.mesh = mesh
        self._jit_cache.clear()

    def _whole_spec(self):
        """PartitionSpec for a whole-mode (N, H, W, C) batch on self.mesh."""
        from jax.sharding import PartitionSpec
        axes = self.mesh.axis_names
        return PartitionSpec('data' if 'data' in axes else None,
                             'spatial' if 'spatial' in axes else None)

    def _init_decode_head(self, decode_head):
        self.decode_head = builder.build_head(decode_head)
        self.align_corners = self.decode_head.align_corners
        self.num_classes = self.decode_head.num_classes
        self.out_channels = self.decode_head.final_out_channels

    def _init_auxiliary_head(self, auxiliary_head):
        if auxiliary_head is None:
            self.auxiliary_head = None
        elif isinstance(auxiliary_head, (list, tuple)):
            self.auxiliary_head = tuple(
                builder.build_head(c) for c in auxiliary_head)
        else:
            self.auxiliary_head = (builder.build_head(auxiliary_head),)

    # -- initialization ------------------------------------------------------
    @property
    def in_channels(self) -> int:
        return int(self.backbone_cfg.get('in_channels', 3))

    def init_weights(self, seed: int = 0, input_size: Tuple[int, int] = (64, 64)):
        """Initialize variables lazily (param shapes are size-independent).

        Traces ``forward_heads`` (not ``__call__``) so auxiliary-head
        parameters are created too.
        """
        rng = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, input_size[0], input_size[1], self.in_channels),
                          jnp.float32)
        self.variables = self.net.init(
            {'params': rng, 'dropout': rng}, dummy, train=False,
            method=type(self.net).forward_heads)
        self._load_backbone_pretrained()
        return self.variables

    def _load_backbone_pretrained(self):
        """Overlay pretrained backbone weights declared by the config
        (``backbone.pretrained`` path or ``init_cfg=dict(type='Pretrained',
        checkpoint=...)``; ≙ mmcv ``BaseModule.init_weights`` checkpoint
        branch). Accepts this framework's ``.ckpt`` files — notably the
        output of ``tools/model_converters/*2jax.py``. Remote specs
        (``open-mmlab://`` / URLs) are skipped with a warning: weights are
        fetched offline by the converter scripts, not at build time.
        """
        import warnings

        spec = self.backbone_cfg.get('pretrained')
        init_cfg = self.backbone_cfg.get('init_cfg')
        if spec is None and isinstance(init_cfg, dict) and \
                init_cfg.get('type') == 'Pretrained':
            spec = init_cfg.get('checkpoint')
        if not spec:
            return
        if '://' in str(spec) or str(spec).startswith('http'):
            warnings.warn(
                f'pretrained="{spec}" is a remote spec; convert it with '
                'tools/model_converters/*2jax.py and point pretrained at '
                'the local .ckpt (skipping remote fetch)')
            return
        import os.path as osp
        if not osp.exists(spec):
            # a local path that doesn't exist is a user error (typo'd
            # checkpoint path) — raise like mmcv's CheckpointLoader
            # (reference contract: test_mit.py:83 expects OSError) rather
            # than silently training from random init
            raise FileNotFoundError(
                f'pretrained checkpoint {spec} not found (convert remote '
                'weights with tools/model_converters/*2jax.py first)')
        from stc_unet_tpu.engine.checkpoint import load_checkpoint_file
        from stc_unet_tpu.utils.backbone_convert import merge_pretrained
        blob = load_checkpoint_file(spec)
        converted = blob['variables']
        # accept bare backbone trees as well as 'backbone'-wrapped ones
        if 'backbone' not in converted.get('params', {}):
            converted = {col: {'backbone': tree}
                         for col, tree in converted.items()}
        template = {col: dict(tree) for col, tree in self.variables.items()}
        sub_t = {col: tree['backbone'] for col, tree in template.items()
                 if 'backbone' in tree}
        sub_c = {col: tree['backbone'] for col, tree in converted.items()
                 if 'backbone' in tree}
        merged, info = merge_pretrained(sub_t, sub_c)
        if info['missing']:
            warnings.warn(f'pretrained {spec}: {len(info["missing"])} '
                          'backbone leaves kept at random init')
        for col, tree in merged.items():
            template[col] = dict(template[col])
            template[col]['backbone'] = tree
        self.variables = template

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _require_vars(self):
        if self.variables is None:
            self.init_weights()
        return self.variables

    # -- feature extraction / encode-decode ----------------------------------
    def extract_feat(self, img):
        variables = self._require_vars()
        return self.net.apply(variables, jnp.asarray(img), train=False,
                              method=EncoderDecoderNet.extract)

    def _jit_encode_decode(self):
        key = 'encode_decode'
        if key not in self._jit_cache:
            net = self.net
            mesh = self.mesh if (self.mesh is not None
                                 and self.mesh.devices.size > 1) else None
            spec = self._whole_spec() if mesh is not None else None

            @jax.jit
            def fn(variables, img):
                if mesh is not None:
                    from jax.sharding import NamedSharding
                    img = jax.lax.with_sharding_constraint(
                        img, NamedSharding(mesh, spec))
                return net.apply(variables, img, train=False)

            self._jit_cache[key] = fn
        return self._jit_cache[key]

    def encode_decode(self, img, img_metas=None):
        """Full-size logits for an image batch (jit-compiled per shape)."""
        variables = self._require_vars()
        return self._jit_encode_decode()(variables, jnp.asarray(img))

    def forward_dummy(self, img):
        return self.encode_decode(img, None)

    # -- training (eager path; the functional engine has its own) ------------
    def compute_losses(self, variables, img, gt_semantic_seg, rng,
                       train: bool = True):
        """Pure loss computation: returns (loss_dict, mutated_state).

        Used both by the eager ``forward_train`` and the jitted engine step.
        """
        gt = jnp.asarray(gt_semantic_seg)
        if gt.ndim == 4:
            gt = gt[..., 0] if gt.shape[-1] == 1 else gt[:, 0]
        outs, new_state = self.net.apply(
            variables, jnp.asarray(img), train=train,
            rngs={'dropout': rng}, mutable=['batch_stats'],
            method=EncoderDecoderNet.forward_heads)
        losses = {}
        losses.update(add_prefix(
            self.decode_head.loss_by_feat(outs['decode'], gt), 'decode'))
        if self.auxiliary_head is not None:
            for i, head in enumerate(self.auxiliary_head):
                prefix = 'aux' if len(self.auxiliary_head) == 1 else f'aux_{i}'
                losses.update(add_prefix(
                    head.loss_by_feat(outs[f'aux_{i}'], gt), prefix))
        return losses, new_state

    def forward_train(self, img, img_metas, gt_semantic_seg, **kwargs):
        variables = self._require_vars()
        losses, new_state = self.compute_losses(
            variables, img, gt_semantic_seg, self._next_rng(), train=True)
        if 'batch_stats' in new_state:
            self.variables = dict(variables,
                                  batch_stats=new_state['batch_stats'])
        return losses

    # -- inference -----------------------------------------------------------
    def _slide_offsets(self, h_img: int, w_img: int):
        h_stride, w_stride = self.test_cfg['stride']
        h_crop, w_crop = self.test_cfg['crop_size']
        h_crop, w_crop = min(h_crop, h_img), min(w_crop, w_img)
        h_grids = max(h_img - h_crop + h_stride - 1, 0) // h_stride + 1
        w_grids = max(w_img - w_crop + w_stride - 1, 0) // w_stride + 1
        offsets = []
        for h_idx in range(h_grids):
            for w_idx in range(w_grids):
                y1 = h_idx * h_stride
                x1 = w_idx * w_stride
                y2 = min(y1 + h_crop, h_img)
                x2 = min(x1 + w_crop, w_img)
                y1 = max(y2 - h_crop, 0)
                x1 = max(x2 - w_crop, 0)
                offsets.append((y1, x1))
        return tuple(offsets), (h_crop, w_crop)

    def _jit_slide(self, img_shape, offsets, crop):
        key = ('slide', img_shape, offsets, crop)
        if key not in self._jit_cache:
            net = self.net
            out_ch = self.out_channels
            b, h_img, w_img, _ = img_shape
            h_crop, w_crop = crop
            # overlap-count normalization is data-independent → bake as const
            count = np.zeros((1, h_img, w_img, 1), np.float32)
            for (y, x) in offsets:
                count[:, y:y + h_crop, x:x + w_crop, :] += 1
            assert (count > 0).all()
            inv_count = jnp.asarray(1.0 / count)

            mesh = self.mesh

            @jax.jit
            def fn(variables, img):
                tiles = jnp.concatenate([
                    jax.lax.dynamic_slice(
                        img, (0, y, x, 0),
                        (b, h_crop, w_crop, img.shape[3]))
                    for (y, x) in offsets], axis=0)  # (G*B, hc, wc, C)
                if mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec
                    tiles = jax.lax.with_sharding_constraint(
                        tiles, NamedSharding(mesh, PartitionSpec('data')))
                logits = net.apply(variables, tiles, train=False)
                logits = logits.reshape(len(offsets), b, h_crop, w_crop,
                                        out_ch)
                preds = jnp.zeros((b, h_img, w_img, out_ch), logits.dtype)
                for g, (y, x) in enumerate(offsets):
                    preds = jax.lax.dynamic_update_slice(
                        preds,
                        jax.lax.dynamic_slice(
                            preds, (0, y, x, 0),
                            (b, h_crop, w_crop, out_ch)) + logits[g],
                        (0, y, x, 0))
                return preds * inv_count

            self._jit_cache[key] = fn
        return self._jit_cache[key]

    def slide_inference(self, img, img_meta, rescale):
        """Sliding-window inference as one XLA program (see module doc)."""
        img = jnp.asarray(img)
        offsets, crop = self._slide_offsets(img.shape[1], img.shape[2])
        fn = self._jit_slide(tuple(img.shape), offsets, crop)
        preds = fn(self._require_vars(), img)
        if rescale:
            resize_shape = img_meta[0]['img_shape'][:2]
            preds = preds[:, :resize_shape[0], :resize_shape[1], :]
            preds = resize(preds, size=img_meta[0]['ori_shape'][:2],
                           mode='bilinear', align_corners=self.align_corners,
                           warning=False)
        return preds

    def whole_inference(self, img, img_meta, rescale):
        """Whole-image inference (reference ``encoder_decoder.py:205``)."""
        seg_logit = self.encode_decode(img, img_meta)
        if rescale:
            resize_shape = img_meta[0]['img_shape'][:2]
            seg_logit = seg_logit[:, :resize_shape[0], :resize_shape[1], :]
            seg_logit = resize(seg_logit, size=img_meta[0]['ori_shape'][:2],
                               mode='bilinear',
                               align_corners=self.align_corners,
                               warning=False)
        return seg_logit

    def inference(self, img, img_meta, rescale):
        """slide/whole + sigmoid/softmax + flip-unflip
        (reference ``encoder_decoder.py:227-263``)."""
        mode = self.test_cfg.get('mode', 'whole')
        assert mode in ['slide', 'whole']
        ori_shape = img_meta[0]['ori_shape']
        assert all(_['ori_shape'] == ori_shape for _ in img_meta)
        if mode == 'slide':
            seg_logit = self.slide_inference(img, img_meta, rescale)
        else:
            seg_logit = self.whole_inference(img, img_meta, rescale)
        if self.out_channels == 1:
            output = jax.nn.sigmoid(seg_logit)
        else:
            output = jax.nn.softmax(seg_logit, axis=-1)
        flip = img_meta[0].get('flip', False)
        if flip:
            flip_direction = img_meta[0]['flip_direction']
            assert flip_direction in ['horizontal', 'vertical']
            if flip_direction == 'horizontal':
                output = output[:, :, ::-1, :]
            else:
                output = output[:, ::-1, :, :]
        return output

    def simple_test(self, img, img_meta, rescale=True):
        """Single-aug test → list of (H, W) numpy label maps."""
        seg_logit = self.inference(img, img_meta, rescale)
        if self.out_channels == 1:
            thr = self.decode_head.final_threshold
            seg_pred = (seg_logit[..., 0] > thr).astype(seg_logit.dtype)
        else:
            seg_pred = jnp.argmax(seg_logit, axis=-1)
        seg_pred = np.asarray(seg_pred)
        return list(seg_pred)

    def simple_test_logits(self, img, img_metas, rescale=True):
        return np.asarray(self.inference(img[0], img_metas[0], rescale))

    def aug_test(self, imgs, img_metas, rescale=True):
        """Logit-averaging TTA (reference ``encoder_decoder.py:291``)."""
        assert rescale
        seg_logit = self.inference(imgs[0], img_metas[0], rescale)
        for i in range(1, len(imgs)):
            seg_logit = seg_logit + self.inference(imgs[i], img_metas[i],
                                                   rescale)
        seg_logit = seg_logit / len(imgs)
        if self.out_channels == 1:
            thr = self.decode_head.final_threshold
            seg_pred = (seg_logit[..., 0] > thr).astype(seg_logit.dtype)
        else:
            seg_pred = jnp.argmax(seg_logit, axis=-1)
        return list(np.asarray(seg_pred))

    def aug_test_logits(self, img, img_metas, rescale=True):
        assert rescale
        imgs = img
        seg_logit = self.inference(imgs[0], img_metas[0], rescale)
        for i in range(1, len(imgs)):
            seg_logit = seg_logit + self.inference(imgs[i], img_metas[i],
                                                   rescale)
        return np.asarray(seg_logit / len(imgs))
