"""SimCC loss: soft cross-entropy of 1D x/y bin classifications against
Gaussian-smoothed label distributions (the KL-divergence training target of
Li et al., ECCV 2022 — the t*log(t) term is constant in the parameters, so
soft CE has the same gradients).

Targets are rendered INSIDE the compiled train step (like the 2D Gaussian
heatmaps of the MSRA family): the host ships only (B, K, 2) joint arrays
in bin coordinates.
"""

from __future__ import annotations

import jax.numpy as jnp


def gaussian_1d_targets(joints, visibility, bins_hw, sigma: float = 6.0):
    """1D Gaussian label distributions over x and y bins.

    joints (B, K, 2) in BIN coordinates (x, y); visibility (B, K);
    bins_hw = (Hb, Wb). Returns (tx (B, K, Wb), ty (B, K, Hb),
    weight (B, K)) — each target row normalized to sum 1; weight zeroes
    invisible joints and joints whose center lies more than 3*sigma
    outside the bin range (the 2D-heatmap family's tolerance: a border
    joint still has most of its Gaussian mass on the grid and must keep
    contributing training signal — requiring x <= Wb-1 would silently
    drop joints pinned to the crop edge in this family only).
    """
    Hb, Wb = bins_hw
    x = joints[..., 0]
    y = joints[..., 1]

    def dist(center, n):
        grid = jnp.arange(n, dtype=jnp.float32)
        t = jnp.exp(-0.5 * ((grid - center[..., None]) / sigma) ** 2)
        return t / jnp.maximum(t.sum(-1, keepdims=True), 1e-12)

    tx = dist(x, Wb)
    ty = dist(y, Hb)
    m = 3.0 * sigma
    inside = ((x > -m) & (x < Wb - 1 + m) & (y > -m) & (y < Hb - 1 + m))
    w = (visibility > 0).astype(jnp.float32) * inside.astype(jnp.float32)
    return tx, ty, w


def simcc_kl_loss(preds, target, target_weight=None):
    """preds: (x_logits (B, K, Wb), y_logits (B, K, Hb)); target: (tx, ty)
    matching distributions; target_weight (B, K). Scalar fp32, normalized
    by the weight sum (masked joints contribute nothing)."""
    x_logits, y_logits = preds
    tx, ty = target
    # numerically-stable log_softmax
    lx = x_logits - x_logits.max(-1, keepdims=True)
    lx = lx - jnp.log(jnp.exp(lx).sum(-1, keepdims=True))
    ly = y_logits - y_logits.max(-1, keepdims=True)
    ly = ly - jnp.log(jnp.exp(ly).sum(-1, keepdims=True))
    ce = -(tx.astype(jnp.float32) * lx).sum(-1) \
        - (ty.astype(jnp.float32) * ly).sum(-1)          # (B, K)
    if target_weight is None:
        return ce.mean()
    w = target_weight.astype(jnp.float32)
    return (ce * w).sum() / jnp.maximum(w.sum(), 1.0)
