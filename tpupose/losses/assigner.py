"""TaskAlignedAssigner — YOLOv8/v11 TAL, fully vectorized.

Capability parity with the reference assigner
(reference: HPE/core/assigner.py:5-305): in-GT-box candidate mask
(:135-160), alignment metric s^alpha * IoU^beta (:162-204), top-k per GT
(:206-241), multi-GT conflict -> highest IoU (:243-272), normalized target
scores (:79-107).

TPU-native: the reference loops and masks on dynamic positive sets; here
everything is a dense (B, M, A) tensor program — one-hot top-k, argmax
conflict resolution, gather-by-index target building. Fully jittable,
static shapes, no host sync.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpupose.losses.bbox import pairwise_iou_xyxy


class TaskAlignedAssigner:
    def __init__(self, topk: int = 10, num_classes: int = 80,
                 alpha: float = 1.0, beta: float = 6.0, eps: float = 1e-9):
        self.topk = topk
        self.num_classes = num_classes
        self.alpha = alpha
        self.beta = beta
        self.eps = eps

    def __call__(self, pd_scores, pd_bboxes, anc_points, gt_labels,
                 gt_bboxes, mask_gt):
        """Assign anchors to GTs.

        pd_scores: (B, A, nc) post-sigmoid scores.
        pd_bboxes: (B, A, 4) xyxy decoded boxes (grid units).
        anc_points: (A, 2) anchor centers.
        gt_labels: (B, M) int; gt_bboxes: (B, M, 4) xyxy; mask_gt: (B, M).

        Returns: target_labels (B, A), target_bboxes (B, A, 4),
        target_scores (B, A, nc), fg_mask (B, A), target_gt_idx (B, A).
        """
        B, A, nc = pd_scores.shape
        M = gt_labels.shape[1]
        mask_gt = mask_gt.astype(jnp.float32)

        # 1) anchors inside GT boxes (assigner.py:135-160)
        lt = anc_points[None, None, :, :] - gt_bboxes[:, :, None, :2]
        rb = gt_bboxes[:, :, None, 2:] - anc_points[None, None, :, :]
        mask_in_gts = (jnp.minimum(lt.min(-1), rb.min(-1)) > self.eps)  # (B,M,A)
        mask_in_gts = mask_in_gts.astype(jnp.float32) * mask_gt[..., None]

        # 2) alignment metric (assigner.py:162-204)
        ious = pairwise_iou_xyxy(gt_bboxes, pd_bboxes)            # (B, M, A)
        ious = jnp.clip(ious, 0.0, 1.0) * mask_in_gts
        cls_idx = jnp.clip(gt_labels, 0, nc - 1)                   # (B, M)
        # score of each anchor for the GT's class: (B, M, A)
        sc = jnp.take_along_axis(
            jnp.swapaxes(pd_scores, 1, 2),                        # (B, nc, A)
            cls_idx[..., None], axis=1)
        align = (sc ** self.alpha) * (ious ** self.beta) * mask_in_gts

        # 3) top-k per GT (assigner.py:206-241): one-hot of the top-k metric
        k = min(self.topk, A)
        topv, topi = jax.lax.top_k(align, k)                       # (B, M, k)
        valid = (topv > self.eps).astype(jnp.float32)
        onehot = jax.nn.one_hot(topi, A, dtype=jnp.float32) * valid[..., None]
        mask_topk = onehot.sum(axis=2)                             # (B, M, A)
        mask_pos = (mask_topk > 0).astype(jnp.float32) * mask_in_gts

        # 4) conflicts: anchor claimed by >1 GT -> keep highest-IoU GT
        #    (assigner.py:243-272)
        n_claims = mask_pos.sum(axis=1, keepdims=True)             # (B, 1, A)
        best_gt = jnp.argmax(ious, axis=1)                         # (B, A)
        best_onehot = jax.nn.one_hot(best_gt, M, axis=1)           # (B, M, A)
        mask_pos = jnp.where(n_claims > 1, best_onehot * mask_pos, mask_pos)

        fg_mask = mask_pos.sum(axis=1) > 0                         # (B, A)
        target_gt_idx = jnp.argmax(mask_pos, axis=1)               # (B, A)

        # 5) build targets by gathering the assigned GT (assigner.py:79-107)
        tl = jnp.take_along_axis(gt_labels, target_gt_idx, axis=1)  # (B, A)
        target_labels = jnp.where(fg_mask, tl, self.num_classes)
        target_bboxes = jnp.take_along_axis(
            gt_bboxes, target_gt_idx[..., None], axis=1)            # (B, A, 4)

        # normalized scores: align * (per-GT max IoU / per-GT max align)
        align_pos = align * mask_pos
        pos_align_max = align_pos.max(axis=-1, keepdims=True)       # (B, M, 1)
        pos_iou_max = (ious * mask_pos).max(axis=-1, keepdims=True)
        norm = align_pos * pos_iou_max / (pos_align_max + self.eps)  # (B, M, A)
        score_val = norm.max(axis=1)                                # (B, A)
        onehot_lbl = jax.nn.one_hot(jnp.clip(target_labels, 0, nc - 1), nc)
        target_scores = onehot_lbl * (score_val * fg_mask)[..., None]

        return (target_labels, target_bboxes, target_scores,
                fg_mask, target_gt_idx)
