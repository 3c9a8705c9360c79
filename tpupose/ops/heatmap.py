"""Gaussian heatmap target generation, fully on device.

The reference's graded top-down configs require MSRA-style Gaussian targets
(BASELINE.json north star). Host NumPy target pasting becomes a single
broadcasted XLA expression: for batch x keypoints, the target is a dense
exp(-d^2 / 2 sigma^2) surface — one fused elementwise kernel on TPU, no
per-joint Python loops, no dynamic patch windows.

Two encodings:
  - `unbiased=True` (default): float-center Gaussian (the DARK/UDP encoding,
    arXiv:1910.06278) — the right pairing for the DARK decoder.
  - `unbiased=False`: integer-rounded center, matching the classic MSRA
    int-paste within quantization.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def heatmap_target_weights(joints, visibility, heatmap_size, sigma: float = 2.0):
    """Per-joint loss weights: visible AND the 3-sigma box overlaps the map.

    joints: (..., K, 2) in heatmap pixels; visibility: (..., K) (>0 == labeled).
    Mirrors the MSRA rule that discards joints whose Gaussian falls fully
    outside the heatmap.
    """
    H, W = heatmap_size
    x, y = joints[..., 0], joints[..., 1]
    r = 3.0 * sigma + 1.0
    inside = (x - r < W) & (x + r >= 0) & (y - r < H) & (y + r >= 0)
    return (visibility > 0) & inside


def gaussian_heatmaps(joints, visibility, heatmap_size, sigma: float = 2.0,
                      unbiased: bool = True, dtype=jnp.float32):
    """Render (B, K, H, W) Gaussian targets + (B, K) target weights.

    joints: (B, K, 2) keypoint coords in *heatmap* pixels (x, y).
    visibility: (B, K) visibility flags (0 = unlabeled).
    """
    H, W = heatmap_size
    mu = joints if unbiased else jnp.floor(joints + 0.5)
    mx = mu[..., 0][..., None, None]  # (B, K, 1, 1)
    my = mu[..., 1][..., None, None]
    ys = lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = lax.broadcasted_iota(jnp.float32, (H, W), 1)
    d2 = (xs - mx) ** 2 + (ys - my) ** 2
    g = jnp.exp(-d2 / (2.0 * sigma * sigma)).astype(dtype)
    w = heatmap_target_weights(joints, visibility, heatmap_size, sigma)
    g = g * w[..., None, None].astype(dtype)
    return g, w.astype(dtype)
