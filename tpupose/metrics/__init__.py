"""Pose metric library — accumulate/compute API.

Capability parity with the reference's metric registry
(reference: HPE/core/metric/__init__.py:1-54): PCP/PCPm/PCK/PCKh/PDJ/MPJPE
plus OKS-AP (PMet), DetectionMAP (DMet), ClassifyMet (CMet), the COCO-17
OKS sigma table, and mask_iou. Each metric is an object with
update()/compute()/reset(); the per-batch math is jit-friendly JAX, the
cross-batch accumulation is host-side (tiny).
"""

import numpy as np

from tpupose.metrics.oks_ap import OKS_SIGMAS, compute_oks, OKSAP
from tpupose.metrics.pck import PCK
from tpupose.metrics.pckh import PCKh
from tpupose.metrics.pdj import PDJ
from tpupose.metrics.pcp import PCP, PCPm
from tpupose.metrics.mpjpe import MPJPE
from tpupose.metrics.auc import AUC, EPE
from tpupose.metrics.det_map import DetectionMAP, box_iou_np
from tpupose.metrics.cls import ClassifyMet

# aliases matching the reference registry (HPE/core/metric/__init__.py)
PMet = OKSAP
DMet = DetectionMAP
CMet = ClassifyMet


def mask_iou(a, b):
    """IoU between boolean masks (reference: HPE/core/metric/__init__.py:20-35).
    a: (N, H, W), b: (M, H, W) -> (N, M)."""
    a = np.asarray(a, bool).reshape(a.shape[0], -1)
    b = np.asarray(b, bool).reshape(b.shape[0], -1)
    inter = (a[:, None, :] & b[None, :, :]).sum(-1)
    union = (a[:, None, :] | b[None, :, :]).sum(-1)
    return inter / np.maximum(union, 1)


METRICS = {
    "oks_ap": OKSAP, "pck": PCK, "pckh": PCKh, "pdj": PDJ,
    "pcp": PCP, "pcpm": PCPm, "mpjpe": MPJPE, "auc": AUC, "epe": EPE,
    "det_map": DetectionMAP, "classify": ClassifyMet,
}

__all__ = [
    "OKS_SIGMAS", "compute_oks", "OKSAP", "PCK", "PCKh", "PDJ", "PCP", "PCPm",
    "MPJPE", "AUC", "EPE", "DetectionMAP", "ClassifyMet", "PMet", "DMet",
    "CMet", "mask_iou", "box_iou_np", "METRICS",
]
