"""PCK — Percentage of Correct Keypoints.

Capability parity with the reference PCK (HPE/core/metric/pck.py:5-104):
a keypoint is correct if ||pred - gt|| <= alpha * L where L is the GT
bbox max-side computed from visible joints (nan-safe masking), or a
user-supplied normalizer.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _bbox_max_side(gt_kpts, vis):
    """L per instance from visible-joint extents (B,)"""
    big = 1e9
    x = jnp.where(vis > 0, gt_kpts[..., 0], big)
    y = jnp.where(vis > 0, gt_kpts[..., 1], big)
    xmin = jnp.min(x, axis=-1)
    ymin = jnp.min(y, axis=-1)
    x = jnp.where(vis > 0, gt_kpts[..., 0], -big)
    y = jnp.where(vis > 0, gt_kpts[..., 1], -big)
    xmax = jnp.max(x, axis=-1)
    ymax = jnp.max(y, axis=-1)
    side = jnp.maximum(xmax - xmin, ymax - ymin)
    return jnp.where(jnp.sum(vis > 0, axis=-1) > 0, side, 0.0)


def pck_batch(pred, gt, vis, alpha: float = 0.2, normalizer=None):
    """(correct_count, visible_count) for a batch. pred/gt: (B,K,2), vis: (B,K)."""
    d = jnp.linalg.norm(pred - gt, axis=-1)  # (B, K)
    L = jnp.asarray(normalizer) if normalizer is not None else _bbox_max_side(gt, vis)
    ok = (d <= alpha * L[..., None]) & (vis > 0) & (L[..., None] > 0)
    return jnp.sum(ok), jnp.sum((vis > 0) & (L[..., None] > 0))


class PCK:
    def __init__(self, alpha: float = 0.2):
        self.alpha = alpha
        self.reset()

    def reset(self):
        self.correct = 0
        self.total = 0
        self.per_joint_correct = None
        self.per_joint_total = None

    def update(self, pred, gt, vis, normalizer=None):
        pred, gt, vis = map(jnp.asarray, (pred, gt, vis))
        d = jnp.linalg.norm(pred - gt, axis=-1)
        L = jnp.asarray(normalizer) if normalizer is not None else _bbox_max_side(gt, vis)
        ok = (d <= self.alpha * L[..., None]) & (vis > 0) & (L[..., None] > 0)
        cnt = (vis > 0) & (L[..., None] > 0)
        okn = np.asarray(ok)
        cn = np.asarray(cnt)
        self.correct += int(okn.sum())
        self.total += int(cn.sum())
        pj_ok = okn.sum(axis=0)
        pj_cnt = cn.sum(axis=0)
        if self.per_joint_correct is None:
            self.per_joint_correct = pj_ok.astype(np.int64)
            self.per_joint_total = pj_cnt.astype(np.int64)
        else:
            self.per_joint_correct += pj_ok
            self.per_joint_total += pj_cnt

    def compute(self) -> dict:
        overall = self.correct / max(self.total, 1)
        pj = (self.per_joint_correct / np.maximum(self.per_joint_total, 1)
              if self.per_joint_correct is not None else None)
        return {"pck": float(overall), "per_joint": pj}
