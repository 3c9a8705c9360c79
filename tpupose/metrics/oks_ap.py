"""OKS + OKS-AP (the COCO keypoint mAP).

Capability parity with the reference's OKSAP
(reference: HPE/core/metric/oksap.py:31-358): per-instance OKS
exp(-d^2 / (2 * area * (2*sigma)^2)) over visible joints, batch
accumulation, per-class x per-threshold AP over 0.50:0.05:0.95 with
precision-envelope integration, returning mAP/mAP50/mAP75/per-class.

The per-batch OKS matrix is computed in JAX (device); matching + AP
integration run on host NumPy over the accumulated (small) lists.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# COCO-17 keypoint sigmas (reference: HPE/core/metric/__init__.py:13-18)
OKS_SIGMAS = np.array([
    0.026, 0.025, 0.025, 0.035, 0.035, 0.079, 0.079, 0.072, 0.072,
    0.062, 0.062, 0.107, 0.107, 0.087, 0.087, 0.089, 0.089,
], dtype=np.float32)


def compute_oks(pred_kpts, gt_kpts, gt_vis, gt_area, sigmas=None):
    """OKS between prediction/GT instance pairs.

    pred_kpts: (N, K, 2), gt_kpts: (M, K, 2), gt_vis: (M, K),
    gt_area: (M,) -> (N, M) OKS matrix. JIT-friendly.
    """
    K = pred_kpts.shape[-2]
    if sigmas is None:
        sigmas = OKS_SIGMAS[:K] if K <= 17 else np.full(K, 0.05, np.float32)
    sig = jnp.asarray(sigmas, jnp.float32)
    d2 = jnp.sum(
        (pred_kpts[:, None, :, :] - gt_kpts[None, :, :, :]) ** 2, axis=-1
    )  # (N, M, K)
    var = (2.0 * sig) ** 2  # (K,)
    area = jnp.maximum(gt_area, 1e-6)[None, :, None]
    e = d2 / (2.0 * area * var[None, None, :])
    vis = (gt_vis > 0).astype(jnp.float32)[None, :, :]
    num = jnp.sum(jnp.exp(-e) * vis, axis=-1)
    den = jnp.maximum(jnp.sum(vis, axis=-1), 1e-9)
    oks = num / den
    # instances with no visible joints get OKS 0
    return jnp.where(jnp.sum(vis, axis=-1) > 0, oks, 0.0)


class OKSAP:
    """COCO-style keypoint AP with accumulate/compute/reset."""

    def __init__(self, num_classes: int = 1, thresholds=None, sigmas=None):
        self.num_classes = num_classes
        self.thresholds = np.asarray(
            thresholds if thresholds is not None else np.arange(0.50, 1.0, 0.05)
        )
        self.sigmas = sigmas
        self.reset()

    def reset(self):
        # per class: list of (score, oks_row vs gts in that image) and gt counts
        self._preds = [[] for _ in range(self.num_classes)]
        self._num_gt = np.zeros(self.num_classes, np.int64)

    def update(self, pred_kpts, pred_scores, gt_kpts, gt_vis, gt_area,
               pred_cls=None, gt_cls=None, pred_valid=None, gt_valid=None):
        """Accumulate one image.

        pred_kpts (N,K,2), pred_scores (N,), gt_kpts (M,K,2), gt_vis (M,K),
        gt_area (M,); optional class ids and padding masks.
        """
        pred_kpts = np.asarray(pred_kpts)
        pred_scores = np.asarray(pred_scores)
        gt_kpts = np.asarray(gt_kpts)
        gt_vis = np.asarray(gt_vis)
        gt_area = np.asarray(gt_area)
        N, M = pred_kpts.shape[0], gt_kpts.shape[0]
        pred_cls = np.zeros(N, np.int64) if pred_cls is None else np.asarray(pred_cls)
        gt_cls = np.zeros(M, np.int64) if gt_cls is None else np.asarray(gt_cls)
        pred_valid = np.ones(N, bool) if pred_valid is None else np.asarray(pred_valid, bool)
        gt_valid = np.ones(M, bool) if gt_valid is None else np.asarray(gt_valid, bool)

        oks = np.asarray(compute_oks(
            jnp.asarray(pred_kpts), jnp.asarray(gt_kpts),
            jnp.asarray(gt_vis), jnp.asarray(gt_area), self.sigmas,
        )) if N and M else np.zeros((N, M), np.float32)

        for c in range(self.num_classes):
            gsel = gt_valid & (gt_cls == c)
            self._num_gt[c] += int(gsel.sum())
            psel = pred_valid & (pred_cls == c)
            if not psel.any():
                continue
            rows = oks[psel][:, gsel] if gsel.any() else np.zeros((int(psel.sum()), 0))
            self._preds[c].append((pred_scores[psel], rows))

    def _ap_for_class(self, c: int):
        """Greedy matching per threshold + 101-pt precision envelope AP."""
        entries = self._preds[c]
        n_gt = self._num_gt[c]
        if not entries or n_gt == 0:
            return np.zeros(len(self.thresholds))
        aps = np.zeros(len(self.thresholds))
        # flatten detections keeping per-image gt association
        for ti, thr in enumerate(self.thresholds):
            scores_all, tps = [], []
            for scores, oks_rows in entries:
                order = np.argsort(-scores)
                taken = np.zeros(oks_rows.shape[1], bool)
                for i in order:
                    scores_all.append(scores[i])
                    if oks_rows.shape[1] == 0:
                        tps.append(False)
                        continue
                    row = np.where(taken, -1.0, oks_rows[i])
                    j = int(np.argmax(row))
                    if row[j] >= thr:
                        taken[j] = True
                        tps.append(True)
                    else:
                        tps.append(False)
            scores_all = np.asarray(scores_all)
            tps = np.asarray(tps)
            order = np.argsort(-scores_all)
            tp = np.cumsum(tps[order])
            fp = np.cumsum(~tps[order])
            recall = tp / n_gt
            precision = tp / np.maximum(tp + fp, 1)
            # precision envelope (monotone decreasing)
            for i in range(len(precision) - 1, 0, -1):
                precision[i - 1] = max(precision[i - 1], precision[i])
            # 101-point interpolation (COCO)
            rc = np.linspace(0, 1, 101)
            idx = np.searchsorted(recall, rc, side="left")
            prec_at = np.where(idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0)
            aps[ti] = prec_at.mean()
        return aps

    def compute(self) -> dict:
        per_class = np.stack([self._ap_for_class(c) for c in range(self.num_classes)])
        valid = self._num_gt > 0
        if not valid.any():
            return {"mAP": 0.0, "mAP50": 0.0, "mAP75": 0.0, "per_class": per_class}
        mean_over_thr = per_class[valid].mean(axis=0)
        i50 = int(np.argmin(np.abs(self.thresholds - 0.5)))
        i75 = int(np.argmin(np.abs(self.thresholds - 0.75)))
        return {
            "mAP": float(mean_over_thr.mean()),
            "mAP50": float(mean_over_thr[i50]),
            "mAP75": float(mean_over_thr[i75]),
            "per_class": per_class.mean(axis=1),
        }
