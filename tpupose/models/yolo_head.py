"""YOLO-style heads: PoseHead (cls + keypoints, no box branch), DetectHead
with DFL, and the anchor grid generator.

Capability parity with the reference heads
(reference: HPE/models/nn/modules/head.py:27-211, twin
pose/pose/model/head/pose.py:8-96; make_anchors HPE/models/utils.py:15-27):

- PoseHead: per-scale cv3 (cls logits) + cv4 (K*3 kpt channels); training
  returns raw per-scale maps; eval concatenates scales and decodes
  kpt_xy = (raw - 0.5 + anchor) * stride with sigmoid on visibility/cls
  (head.py:185-211). Prior-prob 0.01 bias init on the cls conv
  (head.py:165-172).
- DetectHead: reg_max=16 DFL box branch with dist2bbox ltrb decode
  (head.py:27-120); DFL integral (block.py:257-271).

TPU-native: NHWC maps; eval decode is pure jnp over a precomputed static
anchor table — the whole multi-scale decode compiles into the forward.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpupose.models.necks import ConvBlock


def make_anchors(shapes: Sequence[tuple], strides: Sequence[int],
                 grid_cell_offset: float = 0.5):
    """Anchor centers for each scale (reference: HPE/models/utils.py:15-27).

    shapes: [(H, W), ...] static per-scale grid sizes.
    Returns anchors (A, 2) in grid units and stride_per_anchor (A,).
    """
    pts, sts = [], []
    for (h, w), s in zip(shapes, strides):
        sx = jnp.arange(w, dtype=jnp.float32) + grid_cell_offset
        sy = jnp.arange(h, dtype=jnp.float32) + grid_cell_offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        pts.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
        sts.append(jnp.full((h * w,), float(s), jnp.float32))
    return jnp.concatenate(pts), jnp.concatenate(sts)


def dist2bbox(distance, anchor_points, xywh: bool = True):
    """ltrb distances + anchor centers -> boxes (reference head.py:104-120)."""
    lt, rb = jnp.split(distance, 2, axis=-1)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate([c, wh], axis=-1)
    return jnp.concatenate([x1y1, x2y2], axis=-1)


class _ClsBranch(nn.Module):
    """cv3: (dw3x3 + 1x1) -> (3x3 + 1x1) -> 1x1 conv to ncls, with
    prior-prob bias init."""

    ncls: int
    mid: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        c_in = x.shape[-1]
        x = ConvBlock(c_in, 3, dtype=self.dtype)(x, train)
        x = ConvBlock(self.mid, 1, dtype=self.dtype)(x, train)
        x = ConvBlock(self.mid, 3, dtype=self.dtype)(x, train)
        x = ConvBlock(self.mid, 1, dtype=self.dtype)(x, train)
        bias_init = nn.initializers.constant(-math.log((1 - 0.01) / 0.01))
        return nn.Conv(self.ncls, (1, 1), dtype=jnp.float32,
                       bias_init=bias_init)(x)


class _KptBranch(nn.Module):
    """cv4: two 3x3 ConvBlocks -> 1x1 conv to K*3."""

    nk: int
    mid: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ConvBlock(self.mid, 3, dtype=self.dtype)(x, train)
        x = ConvBlock(self.mid, 3, dtype=self.dtype)(x, train)
        return nn.Conv(self.nk, (1, 1), dtype=jnp.float32)(x)


class PoseHead(nn.Module):
    """reg_max=0 (default): the reference's box-free pose head — per-scale
    (ncls + K*3) maps, eval kpt decode (v - 0.5 + anchor) * stride
    (head.py:185-211).

    reg_max>0: the v8/ultralytics-style pose head the v8PoseLoss trains —
    adds a DFL box branch (4*reg_max channels first), and switches the kpt
    decode to the matching v8 convention (2v + anchor - 0.5) * stride
    (reference HPE/utils/loss.py:212-219), so training and inference share
    one decode. Select via cfg.model.reg_max + loss.name=v8_pose.
    """

    num_classes: int = 1
    kpt_shape: tuple = (17, 3)
    strides: tuple = (8, 16, 32)
    reg_max: int = 0
    dtype: Any = jnp.bfloat16

    @property
    def nk(self):
        return self.kpt_shape[0] * self.kpt_shape[1]

    @property
    def box_ch(self):
        return 4 * self.reg_max

    @nn.compact
    def __call__(self, feats, train: bool = True):
        """feats: list of NHWC maps (fine -> coarse).

        train=True: list of per-scale (B, H, W, [4*reg_max +] ncls + nk)
        raw maps. train=False: (B, A, [4 +] ncls + nk) decoded — boxes in
        input pixels (box variant), cls sigmoid, kpt xy in input pixels,
        visibility sigmoid.
        """
        c_in0 = feats[0].shape[-1]
        c2 = max(16, c_in0 // 4, self.box_ch)
        c3 = max(c_in0, min(self.num_classes, 100))
        c4 = max(c_in0 // 4, self.nk)
        outs = []
        for f in feats:
            parts = []
            if self.reg_max > 0:
                box = ConvBlock(c2, 3, dtype=self.dtype)(f, train)
                box = ConvBlock(c2, 3, dtype=self.dtype)(box, train)
                parts.append(nn.Conv(self.box_ch, (1, 1), dtype=jnp.float32)(box))
            parts.append(_ClsBranch(self.num_classes, c3, dtype=self.dtype)(f, train))
            parts.append(_KptBranch(self.nk, c4, dtype=self.dtype)(f, train))
            outs.append(jnp.concatenate(parts, axis=-1))
        if train:
            return outs
        return self.decode(outs)

    def decode(self, outs):
        """Multi-scale eval decode (reference _inference_pose + kpts_decode,
        head.py:185-211; v8 variant HPE/utils/loss.py:212-219)."""
        shapes = [o.shape[1:3] for o in outs]
        anchors, strides = make_anchors(shapes, self.strides)
        B = outs[0].shape[0]
        C = self.box_ch + self.num_classes + self.nk
        flat = jnp.concatenate([o.reshape(B, -1, C) for o in outs], axis=1)
        cls = jax.nn.sigmoid(flat[..., self.box_ch: self.box_ch + self.num_classes])
        K, ndim = self.kpt_shape
        kpt = flat[..., self.box_ch + self.num_classes:].reshape(B, -1, K, ndim)
        if self.reg_max > 0:
            # v8 conventions: DFL boxes + (2v + anchor - 0.5) * stride kpts
            dist = dfl_integral(flat[..., : self.box_ch], self.reg_max)
            boxes = dist2bbox(dist, anchors[None]) * strides[None, :, None]
            xy = (2.0 * kpt[..., :2] + (anchors[None, :, None, :] - 0.5)) \
                * strides[None, :, None, None]
        else:
            boxes = None
            xy = (kpt[..., :2] - 0.5 + anchors[None, :, None, :]) \
                * strides[None, :, None, None]
        if ndim == 3:
            vis = jax.nn.sigmoid(kpt[..., 2:3])
            kpt = jnp.concatenate([xy, vis], axis=-1)
        else:
            kpt = xy
        pieces = ([boxes] if boxes is not None else []) \
            + [cls, kpt.reshape(B, -1, self.nk)]
        return jnp.concatenate(pieces, axis=-1)


def dfl_integral(x, reg_max: int = 16):
    """Distribution focal loss integral: softmax over reg_max bins ->
    expected value (reference block.py:257-271 expresses it as a
    fixed-weight conv; here a pure tensordot). x: (B, A, 4*reg_max)."""
    B, A, _ = x.shape
    x = x.reshape(B, A, 4, reg_max)
    p = jax.nn.softmax(x.astype(jnp.float32), axis=-1)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    return jnp.sum(p * bins, axis=-1)  # (B, A, 4)


class DFL(nn.Module):
    """Module wrapper over dfl_integral (parameter-free)."""

    reg_max: int = 16

    @nn.compact
    def __call__(self, x):
        return dfl_integral(x, self.reg_max)


class DetectHead(nn.Module):
    """YOLO detect head with DFL box branch (reference head.py:27-120).

    objectness=True reproduces the head3 variant (reference
    head3.py:1-199): an extra objectness channel next to the box
    distribution (4*reg_max + 1), split at decode and multiplied into the
    class scores; head3 pairs it with reg_max=4.
    """

    num_classes: int = 80
    reg_max: int = 16
    strides: tuple = (8, 16, 32)
    objectness: bool = False
    dtype: Any = jnp.bfloat16

    @property
    def box_ch(self):
        return 4 * self.reg_max + (1 if self.objectness else 0)

    @nn.compact
    def __call__(self, feats, train: bool = True):
        c_in0 = feats[0].shape[-1]
        c2 = max(16, c_in0 // 4, self.reg_max * 4)
        c3 = max(c_in0, min(self.num_classes, 100))
        outs = []
        for f in feats:
            box = ConvBlock(c2, 3, dtype=self.dtype)(f, train)
            box = ConvBlock(c2, 3, dtype=self.dtype)(box, train)
            box = nn.Conv(self.box_ch, (1, 1), dtype=jnp.float32)(box)
            cls = ConvBlock(c3, 3, dtype=self.dtype)(f, train)
            cls = ConvBlock(c3, 3, dtype=self.dtype)(cls, train)
            bias_init = nn.initializers.constant(-math.log((1 - 0.01) / 0.01))
            cls = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                          bias_init=bias_init)(cls)
            outs.append(jnp.concatenate([box, cls], axis=-1))
        if train:
            return outs
        shapes = [o.shape[1:3] for o in outs]
        anchors, strides = make_anchors(shapes, self.strides)
        B = outs[0].shape[0]
        C = self.box_ch + self.num_classes
        flat = jnp.concatenate([o.reshape(B, -1, C) for o in outs], axis=1)
        dist = dfl_integral(flat[..., : 4 * self.reg_max], self.reg_max)
        boxes = dist2bbox(dist, anchors[None]) * strides[None, :, None]
        cls = jax.nn.sigmoid(flat[..., self.box_ch:])
        if self.objectness:
            obj = jax.nn.sigmoid(flat[..., 4 * self.reg_max: self.box_ch])
            cls = cls * obj
        return jnp.concatenate([boxes, cls], axis=-1)
