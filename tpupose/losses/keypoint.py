"""Keypoint loss family (OKS / Wing / AdaptiveWing / MultiScale / Hybrid).

Capability parity with the reference keypoint losses
(reference: HPE/loss.py:29-222, twin pose/pose/core/loss_fn/pose/pose.py:4-196),
selectable by name like the reference's kpt_loss_type switch
(pose/pose/core/loss_fn/pose/__init__.py:35-46).

All functions are pure, fully vectorized over (..., K) keypoints with a
visibility/positive mask instead of boolean indexing — static shapes for
XLA. Distances are computed in fp32.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpupose.metrics.oks_ap import OKS_SIGMAS


def _sigmas_for(K: int):
    if K <= 17:
        return jnp.asarray(OKS_SIGMAS[:K])
    return jnp.full((K,), 0.05, jnp.float32)


def oks_loss(pred, target, vis_mask, area, sigmas=None, eps: float = 1e-9):
    """YOLO-pose OKS keypoint loss (reference: HPE/loss.py:29-39).

    pred/target: (..., K, 2); vis_mask: (..., K) {0,1}; area: (...,) box area.
    Per-instance: mean over visible joints of 1 - exp(-d^2 / (2 a s^2)),
    scaled by the visible-count factor the reference uses.
    Returns per-instance loss (...,).
    """
    K = pred.shape[-2]
    sig = _sigmas_for(K) if sigmas is None else jnp.asarray(sigmas)
    d2 = jnp.sum((pred - target) ** 2, axis=-1)  # (..., K)
    # reference formula: e = d2 / (2 * (area + eps)) / (2*sigma)^2 / 2
    e = d2 / ((2.0 * sig) ** 2 * (area[..., None] + eps) * 2.0)
    kpt_mask = vis_mask.astype(jnp.float32)
    # visible-count factor: penalize instances with fewer labeled joints less
    denom = jnp.sum(kpt_mask, axis=-1) + eps
    loss = jnp.sum((1.0 - jnp.exp(-e)) * kpt_mask, axis=-1) / denom
    return loss


def wing_loss(pred, target, vis_mask, omega: float = 10.0, epsilon: float = 2.0):
    """Wing loss (reference ImprovedKeypointLoss wing term, HPE/loss.py:41-84)."""
    d = jnp.linalg.norm(pred - target, axis=-1)  # (..., K)
    C = omega - omega * jnp.log(1.0 + omega / epsilon)
    l = jnp.where(d < omega, omega * jnp.log(1.0 + d / epsilon), d - C)
    m = vis_mask.astype(jnp.float32)
    return jnp.sum(l * m, axis=-1) / (jnp.sum(m, axis=-1) + 1e-9)


def adaptive_wing_loss(pred, target, vis_mask, area=None,
                       omega: float = 14.0, theta: float = 0.5,
                       epsilon: float = 1.0, alpha: float = 2.1):
    """Adaptive Wing on (optionally OKS-normalized) distances
    (reference RobustKeypointLoss, HPE/loss.py:87-138)."""
    d = jnp.linalg.norm(pred - target, axis=-1)
    if area is not None:
        d = d / (jnp.sqrt(area[..., None]) + 1e-9)
    # y=0 target form of AWing: alpha - y == alpha
    a = omega * (1.0 / (1.0 + (theta / epsilon) ** (alpha - 1.0))) * (alpha - 1.0) \
        * ((theta / epsilon) ** (alpha - 2.0)) / epsilon
    c = theta * a - omega * jnp.log(1.0 + (theta / epsilon) ** (alpha - 1.0))
    l = jnp.where(d < theta,
                  omega * jnp.log(1.0 + (d / epsilon) ** (alpha - 1.0)),
                  a * d - c)
    m = vis_mask.astype(jnp.float32)
    return jnp.sum(l * m, axis=-1) / (jnp.sum(m, axis=-1) + 1e-9)


def multiscale_keypoint_loss(pred, target, vis_mask, area, scales=(1.0, 0.5, 0.25)):
    """OKS loss averaged over coordinate scales
    (reference MultiScaleKeypointLoss, HPE/loss.py:140-169)."""
    total = 0.0
    for s in scales:
        total = total + oks_loss(pred * s, target * s, vis_mask, area * s * s)
    return total / len(scales)


def hybrid_keypoint_loss(pred, target, vis_mask, area,
                         l1_weight: float = 0.5, smooth_weight: float = 0.1):
    """OKS + 0.5*L1 + 0.1*adjacent-joint smoothness
    (reference HybridKeypointLoss, HPE/loss.py:171-222)."""
    base = oks_loss(pred, target, vis_mask, area)
    m = vis_mask.astype(jnp.float32)
    l1 = jnp.sum(jnp.abs(pred - target).sum(-1) * m, axis=-1) / (jnp.sum(m, axis=-1) + 1e-9)
    # adjacent-joint smoothness: difference of consecutive joint offsets
    dp = pred[..., 1:, :] - pred[..., :-1, :]
    dt = target[..., 1:, :] - target[..., :-1, :]
    mm = m[..., 1:] * m[..., :-1]
    smooth = jnp.sum(jnp.abs(dp - dt).sum(-1) * mm, axis=-1) / (jnp.sum(mm, axis=-1) + 1e-9)
    return base + l1_weight * l1 + smooth_weight * smooth


KPT_LOSSES = {
    "oks": lambda p, t, v, a: oks_loss(p, t, v, a),
    "wing": lambda p, t, v, a: wing_loss(p, t, v),
    "adaptive_wing": lambda p, t, v, a: adaptive_wing_loss(p, t, v, a),
    "multiscale": multiscale_keypoint_loss,
    "hybrid": hybrid_keypoint_loss,
}


def get_kpt_loss(name: str):
    if name not in KPT_LOSSES:
        raise ValueError(f"unknown kpt loss {name!r}; have {sorted(KPT_LOSSES)}")
    return KPT_LOSSES[name]
