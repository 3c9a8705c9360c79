"""OKS-based non-maximum suppression over pose instances.

The official COCO top-down protocol (and every HRNet-lineage codebase)
deduplicates overlapping person predictions with OKS-NMS before AP
scoring: detector boxes overlap, so two crops of the same person yield
near-identical poses and the duplicate counts as a false positive. The
reference repo stops at box-IoU NMS for its single-stage family
(HPE/test.py:169-172, torchvision.ops.nms with class offsets); this adds
the keypoint-similarity analog the detection-box protocol requires.

Host-side numpy by design: runs per image over N <= max_per_image
instances after results have already been fetched for metric
accumulation — a greedy O(N^2) loop over tiny N, same placement as the
metric bookkeeping around it (engine/det_eval.py).

Variants:
  oks_nms      — hard suppression at `threshold` (protocol default 0.9)
  soft_oks_nms — Gaussian rescoring score *= exp(-oks^2 / sigma_ns),
                 keep the top max_dets after rescoring
"""

from __future__ import annotations

import numpy as np

from tpupose.metrics.oks_ap import default_sigmas


def oks_iou(pose, others, area, other_areas, sigmas=None, kscores=None,
            other_kscores=None, vis_threshold: float = 0.0):
    """OKS between one pose and N others.

    pose: (K, 2); others: (N, K, 2); area / other_areas: scalar, (N,).
    kscores: per-keypoint confidences (K,) / (N, K) — with
    vis_threshold > 0 only joints both instances are confident about
    contribute (the in_vis_thre of the official implementation).
    """
    if sigmas is None:
        sigmas = default_sigmas(pose.shape[0])  # same table as AP scoring
    sigmas = np.asarray(sigmas, np.float32)
    var = (2.0 * sigmas) ** 2
    d2 = np.sum((others - pose[None]) ** 2, axis=-1)  # (N, K)
    s = (area + other_areas)[:, None] / 2.0 + np.spacing(1)
    e = d2 / (2.0 * s * var[None])
    w = np.ones_like(e)
    if vis_threshold > 0 and kscores is not None and other_kscores is not None:
        w = ((kscores[None] > vis_threshold)
             & (other_kscores > vis_threshold)).astype(np.float32)
    num = np.sum(np.exp(-e) * w, axis=-1)
    den = np.maximum(np.sum(w, axis=-1), np.spacing(1))
    return num / den


def oks_nms(kpts, scores, areas, threshold: float = 0.9, sigmas=None,
            kscores=None, vis_threshold: float = 0.0) -> np.ndarray:
    """Greedy hard OKS-NMS. kpts: (N, K, 2); scores/areas: (N,).
    Returns indices kept, in descending-score order."""
    kpts = np.asarray(kpts, np.float32)
    scores = np.asarray(scores, np.float32)
    areas = np.asarray(areas, np.float32)
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        rest = order[1:]
        ious = oks_iou(kpts[i], kpts[rest], areas[i], areas[rest], sigmas,
                       None if kscores is None else kscores[i],
                       None if kscores is None else kscores[rest],
                       vis_threshold)
        order = rest[ious <= threshold]
    return np.asarray(keep, np.int64)


def soft_oks_nms(kpts, scores, areas, sigma_ns: float = 0.1,
                 score_threshold: float = 1e-3, max_dets: int = 20,
                 sigmas=None, kscores=None,
                 vis_threshold: float = 0.0):
    """Soft OKS-NMS with Gaussian rescoring.

    Returns (keep_indices, rescored_scores[keep]) — order is by the
    DECAYED score, capped at max_dets; instances whose rescored score
    drops below score_threshold are discarded.
    """
    kpts = np.asarray(kpts, np.float32)
    scores = np.asarray(scores, np.float32).copy()
    areas = np.asarray(areas, np.float32)
    order = np.argsort(-scores)
    keep, kept_scores = [], []
    while order.size and len(keep) < max_dets:
        i = order[0]
        keep.append(int(i))
        kept_scores.append(float(scores[i]))
        rest = order[1:]
        if not rest.size:
            break
        ious = oks_iou(kpts[i], kpts[rest], areas[i], areas[rest], sigmas,
                       None if kscores is None else kscores[i],
                       None if kscores is None else kscores[rest],
                       vis_threshold)
        scores[rest] = scores[rest] * np.exp(-(ious ** 2) / sigma_ns)
        rest = rest[scores[rest] > score_threshold]
        order = rest[np.argsort(-scores[rest])]
    return np.asarray(keep, np.int64), np.asarray(kept_scores, np.float32)
