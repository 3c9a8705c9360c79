"""Box geometry: keypoints->box, CIoU, format conversions.

Capability parity with the reference's keypoint-box geometry
(HPE/loss.py:277-347; shared copies pose/pose/utils/bbox.py:4-73):
visibility-aware kpts->xywh box with a 10% percentile outlier trim, CIoU,
and the xywh/xyxy converters used by the assigners.
"""

from __future__ import annotations

import jax.numpy as jnp


def xywh2xyxy(box):
    cx, cy, w, h = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy2xywh(box):
    x1, y1, x2, y2 = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def kpts_to_box(kpts, vis_mask, trim: float = 0.1, pad: float = 1.0):
    """Visibility-aware keypoints -> xywh box with percentile trimming.

    Exact static-shape port of the reference's point2box_xywh
    (HPE/loss.py:277-315), numerically matched by
    tests/test_reference_parity.py:
      - < 2 visible joints -> fall back to ALL joints
      - > 4 usable joints -> trim max(1, floor(0.1*n)) extremes per side
      - otherwise plain min/max; w/h clamped to >= 1.0
    kpts: (..., K, 2); vis_mask: (..., K). Returns (..., 4) cx cy w h.
    """
    K = kpts.shape[-2]
    m = (vis_mask > 0).astype(jnp.float32)
    big = 1e9
    n_vis = jnp.sum(m, axis=-1, keepdims=True)          # (..., 1)
    # reference: fewer than 2 visible -> use every joint
    m_eff = jnp.where(n_vis < 2, jnp.ones_like(m), m)
    n_eff = jnp.sum(m_eff, axis=-1, keepdims=True)

    # trim count: max(1, floor(trim*n)) when n > 4, else 0
    k = jnp.where(n_eff > 4,
                  jnp.maximum(jnp.floor(trim * n_eff), 1.0),
                  0.0)
    k = jnp.clip(k, 0, K - 1).astype(jnp.int32)

    def trimmed_minmax(coord):
        lo_fill = jnp.where(m_eff > 0, coord, big)
        hi_fill = jnp.where(m_eff > 0, coord, -big)
        lo_sorted = jnp.sort(lo_fill, axis=-1)          # ascending, unused at end
        hi_sorted = jnp.sort(hi_fill, axis=-1)          # ascending, unused at start
        lo = jnp.take_along_axis(lo_sorted, k, axis=-1)[..., 0]
        hi_idx = jnp.clip(K - 1 - k, 0, K - 1)
        hi = jnp.take_along_axis(hi_sorted, hi_idx, axis=-1)[..., 0]
        return lo, hi

    xlo, xhi = trimmed_minmax(kpts[..., 0])
    ylo, yhi = trimmed_minmax(kpts[..., 1])
    w = jnp.maximum(xhi - xlo, 1.0) * pad
    h = jnp.maximum(yhi - ylo, 1.0) * pad
    cx = (xlo + xhi) / 2
    cy = (ylo + yhi) / 2
    return jnp.stack([cx, cy, w, h], axis=-1)


def ciou(box1, box2, eps: float = 1e-7):
    """Complete IoU between xywh boxes, elementwise on broadcastable shapes
    (reference: HPE/loss.py:317-347). Returns (...,)."""
    b1 = xywh2xyxy(box1)
    b2 = xywh2xyxy(box2)
    ix1 = jnp.maximum(b1[..., 0], b2[..., 0])
    iy1 = jnp.maximum(b1[..., 1], b2[..., 1])
    ix2 = jnp.minimum(b1[..., 2], b2[..., 2])
    iy2 = jnp.minimum(b1[..., 3], b2[..., 3])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    w1, h1 = box1[..., 2], box1[..., 3]
    w2, h2 = box2[..., 2], box2[..., 3]
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    # enclosing box diagonal
    ex1 = jnp.minimum(b1[..., 0], b2[..., 0])
    ey1 = jnp.minimum(b1[..., 1], b2[..., 1])
    ex2 = jnp.maximum(b1[..., 2], b2[..., 2])
    ey2 = jnp.maximum(b1[..., 3], b2[..., 3])
    c2 = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2 + eps
    # center distance
    rho2 = (box1[..., 0] - box2[..., 0]) ** 2 + (box1[..., 1] - box2[..., 1]) ** 2
    # aspect term
    v = (4.0 / (jnp.pi ** 2)) * (jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))) ** 2
    alpha = v / (v - iou + (1.0 + eps))
    alpha = jax_stop_gradient(alpha)
    return iou - rho2 / c2 - alpha * v


def jax_stop_gradient(x):
    import jax

    return jax.lax.stop_gradient(x)


def pairwise_iou_xyxy(a, b, eps: float = 1e-9):
    """(..., N, 4) x (..., M, 4) -> (..., N, M) plain IoU (for assigners)."""
    ix1 = jnp.maximum(a[..., :, None, 0], b[..., None, :, 0])
    iy1 = jnp.maximum(a[..., :, None, 1], b[..., None, :, 1])
    ix2 = jnp.minimum(a[..., :, None, 2], b[..., None, :, 2])
    iy2 = jnp.minimum(a[..., :, None, 3], b[..., None, :, 3])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    aa = jnp.clip(a[..., 2] - a[..., 0], 0) * jnp.clip(a[..., 3] - a[..., 1], 0)
    ab = jnp.clip(b[..., 2] - b[..., 0], 0) * jnp.clip(b[..., 3] - b[..., 1], 0)
    return inter / (aa[..., :, None] + ab[..., None, :] - inter + eps)
