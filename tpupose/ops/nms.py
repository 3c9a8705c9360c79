"""Fully-vectorized on-device NMS with static shapes.

Replaces torchvision.ops.nms (C++/CUDA) used in the reference's pose
postprocess (reference: HPE/test.py:169-172). TPU-native design per
SURVEY.md §2.9: score-sorted greedy suppression over a static-size IoU
matrix inside jit — no host round-trip, no dynamic output shapes
(invalid slots are masked, not dropped).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def box_iou(a, b):
    """Pairwise IoU. a: (N, 4), b: (M, 4) in xyxy -> (N, M)."""
    ax1, ay1, ax2, ay2 = a[:, 0], a[:, 1], a[:, 2], a[:, 3]
    bx1, by1, bx2, by2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    ix1 = jnp.maximum(ax1[:, None], bx1[None, :])
    iy1 = jnp.maximum(ay1[:, None], by1[None, :])
    ix2 = jnp.minimum(ax2[:, None], bx2[None, :])
    iy2 = jnp.minimum(ay2[:, None], by2[None, :])
    iw = jnp.maximum(ix2 - ix1, 0.0)
    ih = jnp.maximum(iy2 - iy1, 0.0)
    inter = iw * ih
    area_a = jnp.maximum(ax2 - ax1, 0.0) * jnp.maximum(ay2 - ay1, 0.0)
    area_b = jnp.maximum(bx2 - bx1, 0.0) * jnp.maximum(by2 - by1, 0.0)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms(boxes, scores, iou_threshold: float = 0.45, valid=None):
    """Greedy NMS. boxes (N,4) xyxy, scores (N,) -> keep mask (N,) bool.

    N is static; sorting + an O(N) suppression scan over the IoU matrix.
    `valid` optionally masks padded slots.
    """
    n = boxes.shape[0]
    if valid is not None:
        scores = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-scores)
    b = boxes[order]
    s = scores[order]
    iou = box_iou(b, b)
    live = s > -jnp.inf

    def body(i, keep):
        # keep[i] iff no higher-scored kept box overlaps it
        sup = jnp.any(keep & (iou[:, i] > iou_threshold) & (jnp.arange(n) < i))
        return keep.at[i].set(live[i] & jnp.logical_not(sup))

    keep_sorted = lax.fori_loop(0, n, body, jnp.zeros(n, dtype=bool))
    keep = jnp.zeros(n, dtype=bool).at[order].set(keep_sorted)
    return keep


def batched_pose_nms(boxes, scores, classes, keypoints,
                     iou_threshold: float = 0.45,
                     conf_threshold: float = 0.25,
                     max_det: int = 100,
                     class_offset: float = 7680.0,
                     pre_nms_topk: int = 512):
    """Single-image pose NMS with the reference's class-offset trick
    (HPE/test.py:169: boxes offset by class_id * 7680 so NMS is per-class).

    boxes (N,4) xyxy, scores (N,), classes (N,) int, keypoints (N,K,3).
    Returns fixed-size (max_det, ...) arrays + a valid mask — jittable.

    For dense anchor grids (e.g. 8400 anchors at 640x640) the quadratic
    suppression is gated behind a top-k preselect: only the best
    `pre_nms_topk` candidates by score enter NMS — the IoU matrix stays
    (topk, topk) and the suppression scan O(topk), independent of grid
    size (the reference's conf filter HPE/test.py:99-117 plays this role).
    """
    n = boxes.shape[0]
    k = min(pre_nms_topk, n)
    if k < n:
        top_scores, sel = jax.lax.top_k(scores, k)
        boxes = boxes[sel]
        classes = classes[sel]
        keypoints = keypoints[sel]
        scores = top_scores
    valid = scores >= conf_threshold
    off = classes.astype(boxes.dtype)[:, None] * class_offset
    keep = nms(boxes + off, scores, iou_threshold, valid=valid)
    sel_scores = jnp.where(keep, scores, -1.0)
    top = jnp.argsort(-sel_scores)[:max_det]
    out_valid = sel_scores[top] > 0
    z = out_valid.astype(boxes.dtype)
    return (
        boxes[top] * z[:, None],
        sel_scores[top] * z,
        jnp.where(out_valid, classes[top], -1),
        keypoints[top] * z[:, None, None],
        out_valid,
    )
