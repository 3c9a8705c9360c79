"""JointsMSELoss for heatmap training (graded config; the MSRA loss
the BASELINE.json north star names). 0.5 * MSE per joint, masked by
target_weight, averaged over batch and joints."""

from __future__ import annotations

import jax.numpy as jnp


def joints_mse_loss(pred, target, target_weight=None, use_target_weight=True):
    """pred/target: (B, Hh, Wh, K) or (B, K, Hh, Wh); target_weight: (B, K).

    Returns a scalar fp32 loss. Layout-agnostic: the K axis is inferred
    from target_weight when given, else assumed last (NHWC convention).
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if pred.ndim != 4:
        raise ValueError("expected 4D heatmaps")
    if target_weight is not None and use_target_weight:
        K = target_weight.shape[-1]
        if pred.shape[-1] == K:          # NHWK
            w = target_weight[:, None, None, :]
        elif pred.shape[1] == K:         # NKHW
            w = target_weight[:, :, None, None]
        else:
            raise ValueError("target_weight does not match any heatmap axis")
        se = (pred - target) ** 2 * w
        denom = jnp.maximum(jnp.sum(target_weight), 1.0)
        per_px = pred.size / (pred.shape[0] * K)
        return 0.5 * jnp.sum(se) / (denom * per_px)
    return 0.5 * jnp.mean((pred - target) ** 2)


def joints_mse_weighted_loss(pred, target, target_weight=None,
                             peak_weight: float = 9.0):
    """Heatmap-weighting MSE (Lightweight HPE w/ Heatmap-Weighting Loss,
    arXiv:2205.10611): per-pixel weight 1 + peak_weight * target, so the
    few foreground pixels of a sparse Gaussian target drive the gradient
    instead of the sea of background zeros — counters the predict-zero
    plateau of plain JointsMSE (the 0.5*pi*sigma^2/(Hh*Wh) floor, see
    tests/test_train_smoke.py) without changing the optimum.

    Same signature/layout rules as joints_mse_loss; selectable via
    loss.name=joints_mse_weighted.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if pred.ndim != 4:
        raise ValueError("expected 4D heatmaps")
    px_w = 1.0 + peak_weight * target
    se = (pred - target) ** 2 * px_w
    if target_weight is not None:
        K = target_weight.shape[-1]
        if pred.shape[-1] == K:          # NHWK
            w = target_weight[:, None, None, :]
        elif pred.shape[1] == K:         # NKHW
            w = target_weight[:, :, None, None]
        else:
            raise ValueError("target_weight does not match any heatmap axis")
        se = se * w
        denom = jnp.maximum(jnp.sum(target_weight), 1.0)
        per_px = pred.size / (pred.shape[0] * K)
        return 0.5 * jnp.sum(se) / (denom * per_px)
    return 0.5 * jnp.mean(se)


def coord_mse_loss(pred, target, visibility=None):
    """Direct coordinate-regression loss (the DeepPose objective,
    reference: HPE/models/reference/bottom_up/regression — MSE on
    normalized joint coordinates, visibility-masked).

    pred/target: (B, K, 2) in normalized [0, 1] coords; visibility: (B, K).
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    se = jnp.sum((pred - target) ** 2, axis=-1)  # (B, K)
    if visibility is not None:
        m = (visibility > 0).astype(jnp.float32)
        return jnp.sum(se * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(se)
