"""ComputeLoss — the center-cell assigner loss used to train the
single-stage YOLO-pose model.

Capability parity with the reference ComputeLoss
(reference: HPE/loss.py:228-448; twin pose/pose/core/loss_fn/pose/
__init__.py:5-169). Semantics, per scale:

  - GT box center cell -> positive (loss.py:377-387)
  - box/kpt offsets relative to that cell, in grid units (:394-399)
  - OKS-family kpt loss + BCE visibility on positives (:423-424)
  - cls target = detached clamped CIoU of the kpt-derived box vs GT box
    as a soft quality score, VarifocalLoss over ALL cells (:426-435)
  - weights cls 1 / kpt 10 / vis 5, normalized by num_pos (:437-446)

TPU-native re-design (SURVEY.md §7 "hard parts"): the reference builds
python-side index lists and scatters with boolean masks — dynamic shapes.
Here GTs arrive padded to (B, M) with an instance mask; the center-cell
scatter is one `.at[b, gy, gx, c].max()` scatter, positives are gathered
with take_along_axis, and everything is masked arithmetic. One fused XLA
program, fully batched, no host sync.

Deviation (intentional, see SURVEY.md §2.11 "implement the intent"):
the reference divides the kpt loss by num_pos twice (its kpt_loss_fn
already takes a per-instance mean); here each term is normalized exactly
once by num_pos.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from tpupose.losses.bbox import ciou, kpts_to_box
from tpupose.losses.classify import binary_cross_entropy_with_logits, varifocal_loss
from tpupose.losses.keypoint import get_kpt_loss


class ComputeLoss:
    def __init__(self, num_keypoints: int, num_classes: int = 1,
                 strides: Sequence[int] = (8, 16, 32),
                 kpt_loss_type: str = "hybrid",
                 cls_weight: float = 1.0, kpt_weight: float = 10.0,
                 vis_weight: float = 5.0, use_varifocal: bool = True):
        self.K = num_keypoints
        self.nc = num_classes
        self.strides = tuple(strides)
        self.kpt_loss = get_kpt_loss(kpt_loss_type)
        self.cls_weight = cls_weight
        self.kpt_weight = kpt_weight
        self.vis_weight = vis_weight
        self.use_varifocal = use_varifocal
        # running sums for the reference's loss-accumulation API
        # (pose/pose/core/loss_fn/pose/__init__.py:55-67)
        self._sums = {"cls": 0.0, "kpt": 0.0, "vis": 0.0, "n": 0}

    # reference API: set_train_loss / add_loss running sums
    def set_train_loss(self):
        self._sums = {"cls": 0.0, "kpt": 0.0, "vis": 0.0, "n": 0}

    def add_loss(self, parts):
        self._sums["cls"] += float(parts["cls"])
        self._sums["kpt"] += float(parts["kpt"])
        self._sums["vis"] += float(parts["vis"])
        self._sums["n"] += 1

    def mean_loss(self):
        n = max(self._sums["n"], 1)
        return {k: v / n for k, v in self._sums.items() if k != "n"}

    def _one_scale(self, pred, targets):
        """pred: (B, H, W, nc + K*3) raw map. Returns partial sums."""
        B, H, W, _ = pred.shape
        K, nc = self.K, self.nc
        boxes = targets["boxes"]          # (B, M, 4) normalized cx cy w h
        kpts = targets["keypoints"]       # (B, M, K, 3) normalized
        cls_idx = targets["classes"]      # (B, M) int
        imask = targets["instance_mask"].astype(jnp.float32)  # (B, M)
        M = boxes.shape[1]

        # scale to grid units
        gscale = jnp.array([W, H, W, H], jnp.float32)
        gbox = boxes * gscale
        gkx = kpts[..., 0] * W
        gky = kpts[..., 1] * H
        kvis = (kpts[..., 2] > 0).astype(jnp.float32) * imask[..., None]

        gx = jnp.clip(gbox[..., 0].astype(jnp.int32), 0, W - 1)  # (B, M)
        gy = jnp.clip(gbox[..., 1].astype(jnp.int32), 0, H - 1)

        # ---- gather positives -------------------------------------------------
        flat = pred.reshape(B, H * W, -1)
        cell = gy * W + gx                                       # (B, M)
        ppos = jnp.take_along_axis(flat, cell[..., None], axis=1)  # (B, M, C)
        pk = ppos[..., nc:].reshape(B, M, K, 3).astype(jnp.float32)
        pk_xy = pk[..., :2]
        pk_vis = pk[..., 2]

        # GT offsets relative to cell
        gt_xy = jnp.stack([gkx - gx[..., None], gky - gy[..., None]], axis=-1)
        gt_box_off = jnp.concatenate([
            (gbox[..., 0] - gx)[..., None], (gbox[..., 1] - gy)[..., None],
            gbox[..., 2:4],
        ], axis=-1)
        area = gbox[..., 2] * gbox[..., 3]                       # (B, M)

        # ---- keypoint + visibility losses on positives ------------------------
        kl = self.kpt_loss(pk_xy, gt_xy, kvis, area)             # (B, M)
        loss_kpt = jnp.sum(kl * imask)
        vis_bce = binary_cross_entropy_with_logits(pk_vis, kvis)
        loss_vis = jnp.sum(vis_bce * imask[..., None])

        # ---- soft cls target: detached CIoU of kpt-derived box ---------------
        pred_box = kpts_to_box(pk_xy, kvis)
        quality = jnp.clip(ciou(pred_box, gt_box_off), 0.0, 1.0)
        quality = jax.lax.stop_gradient(jnp.nan_to_num(quality)) * imask

        # scatter quality into a (B, H*W, nc) target map; overlapping GTs in
        # one cell keep the max score
        tgt = jnp.zeros((B, H * W, nc), jnp.float32)
        b_ix = jnp.broadcast_to(jnp.arange(B)[:, None], (B, M))
        tgt = tgt.at[b_ix, cell, cls_idx].max(quality)

        pred_cls = flat[..., :nc].astype(jnp.float32)
        label = (tgt > 0).astype(jnp.float32)
        if self.use_varifocal:
            cl = varifocal_loss(pred_cls, tgt, label)
        else:
            cl = binary_cross_entropy_with_logits(pred_cls, tgt)
        # per-image weight: eval tail-batch padding rows carry 0 so their
        # confident predictions don't score against all-zero targets
        smask = targets.get("sample_mask")
        if smask is not None:
            cl = cl * smask[:, None, None]
        loss_cls = jnp.sum(cl)

        num_pos = jnp.sum(imask)
        return loss_cls, loss_kpt, loss_vis, num_pos

    def __call__(self, preds, targets):
        """preds: list of per-scale raw NHWC maps (train-mode head output).

        targets: {"boxes": (B,M,4) normalized xywh, "classes": (B,M) int,
        "keypoints": (B,M,K,3) normalized, "instance_mask": (B,M) bool}.
        Returns (total_loss, parts_dict).
        """
        tc = tk = tv = npos = 0.0
        for pred in preds:
            c, k, v, n = self._one_scale(pred, targets)
            tc += c
            tk += k
            tv += v
            npos += n
        denom = jnp.maximum(npos, 1.0)
        loss_cls = tc / denom * self.cls_weight
        loss_kpt = tk / denom * self.kpt_weight
        loss_vis = tv / denom * self.vis_weight
        total = loss_cls + loss_kpt + loss_vis
        return total, {"cls": loss_cls, "kpt": loss_kpt, "vis": loss_vis}
