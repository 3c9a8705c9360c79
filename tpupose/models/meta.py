"""GaussianPooling + MetaSpace: EMA memory of per-keypoint features.

Capability parity with the reference
(reference: HPE/models/nn/modules/pool.py:4-63 GaussianPooling — fixed
5x5 sigma=2 Gaussian-weighted patch pooling around clamped integer
keypoint coords with center-pixel fallback;
HPE/models/nn/modules/meta.py:6-262 MetaSpace — per-level running
sum/count buffers accumulated at GT keypoints, update_meta_spaces() EMA
with momentum 0.9, and fusion of current features with the meta memory
via GatedAttention + MLP projection).

TPU design: the pooling is a dense gather over a static 5x5 offset grid
(vmapped over batch and keypoints); the running buffers live in a
dedicated flax variable collection "meta_space" (the torch register_buffer
analog) so they checkpoint and replicate like batch_stats.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpupose.models.attention import GatedAttention


def gaussian_pool(feat, kpts, vis, window: int = 5, sigma: float = 2.0):
    """Gaussian-weighted patch pooling.

    feat: (B, H, W, C); kpts: (B, K, 2) in feature pixels (x, y);
    vis: (B, K). Returns (B, K, C). Out-of-bounds taps are dropped from
    the weight normalization; a fully-out-of-bounds keypoint falls back to
    its clamped center pixel.
    """
    B, H, W, C = feat.shape
    K = kpts.shape[1]
    half = window // 2
    offs = jnp.arange(-half, half + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")        # (w, w)
    w2 = jnp.exp(-(ox ** 2 + oy ** 2) / (2.0 * sigma * sigma))  # (w, w)

    cx = jnp.clip(jnp.round(kpts[..., 0]), 0, W - 1)        # (B, K)
    cy = jnp.clip(jnp.round(kpts[..., 1]), 0, H - 1)
    gx = cx[..., None, None] + ox[None, None]               # (B, K, w, w)
    gy = cy[..., None, None] + oy[None, None]
    inb = (gx >= 0) & (gx < W) & (gy >= 0) & (gy < H)
    gxc = jnp.clip(gx, 0, W - 1).astype(jnp.int32)
    gyc = jnp.clip(gy, 0, H - 1).astype(jnp.int32)

    flat = feat.reshape(B, H * W, C)
    idx = (gyc * W + gxc).reshape(B, K * window * window)
    vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
    vals = vals.reshape(B, K, window, window, C)

    wts = w2[None, None] * inb.astype(jnp.float32)          # (B, K, w, w)
    denom = wts.sum((-1, -2))                               # (B, K)
    pooled = (vals * wts[..., None].astype(vals.dtype)).sum((2, 3))
    # center-pixel fallback when all taps are out of bounds
    center = jnp.take_along_axis(
        flat, (cy * W + cx).astype(jnp.int32)[..., None], axis=1)
    pooled = jnp.where((denom > 0)[..., None],
                       pooled / jnp.maximum(denom, 1e-9)[..., None].astype(pooled.dtype),
                       center)
    return pooled * (vis > 0)[..., None].astype(pooled.dtype)


class MetaSpace(nn.Module):
    """EMA per-keypoint feature memory over multiple pyramid levels."""

    num_keypoints: int
    dim: int
    num_levels: int = 3
    momentum: float = 0.9
    num_heads: int = 4
    dtype: Any = jnp.bfloat16

    def setup(self):
        L, K, D = self.num_levels, self.num_keypoints, self.dim
        self.meta_features = self.variable(
            "meta_space", "meta_features", lambda: jnp.zeros((L, K, D)))
        self.feature_sum = self.variable(
            "meta_space", "feature_sum", lambda: jnp.zeros((L, K, D)))
        self.feature_count = self.variable(
            "meta_space", "feature_count", lambda: jnp.zeros((L, K)))
        self.fusers = [
            GatedAttention(self.dim, self.num_heads, dtype=self.dtype,
                           name=f"fuse_{i}")
            for i in range(self.num_levels)
        ]
        self.proj = nn.Dense(self.dim, dtype=self.dtype, name="proj")

    def accumulate_features(self, feats: Sequence, kpts_per_level, vis):
        """Pool GT-keypoint features per level into the running sums
        (reference meta.py accumulate_features)."""
        if self.is_initializing():
            return
        for i, (f, kp) in enumerate(zip(feats, kpts_per_level)):
            pooled = gaussian_pool(f, kp, vis)                 # (B, K, D)
            m = (vis > 0).astype(jnp.float32)
            self.feature_sum.value = self.feature_sum.value.at[i].add(
                (pooled * m[..., None].astype(pooled.dtype))
                .sum(0).astype(jnp.float32))
            self.feature_count.value = self.feature_count.value.at[i].add(m.sum(0))

    def update_meta_spaces(self):
        """EMA-merge accumulated means into the memory, reset accumulators
        (reference meta.py update_meta_spaces, momentum 0.9)."""
        cnt = self.feature_count.value[..., None]
        mean = self.feature_sum.value / jnp.maximum(cnt, 1e-9)
        has = cnt > 0
        new = jnp.where(
            has, self.momentum * self.meta_features.value + (1 - self.momentum) * mean,
            self.meta_features.value)
        # first write: adopt the mean directly
        first = has & (jnp.abs(self.meta_features.value).sum(-1, keepdims=True) == 0)
        self.meta_features.value = jnp.where(first, mean, new)
        self.feature_sum.value = jnp.zeros_like(self.feature_sum.value)
        self.feature_count.value = jnp.zeros_like(self.feature_count.value)

    def fuse_with_meta_features(self, current, level: int):
        """Fuse (B, K, D) current keypoint features with the level's memory
        via gated cross-attention over the concatenated token set + MLP
        projection (reference meta.py fuse_with_meta_features)."""
        B = current.shape[0]
        mem = jnp.broadcast_to(
            self.meta_features.value[level].astype(current.dtype),
            current.shape)
        tokens = jnp.concatenate([current, mem], axis=1)       # (B, 2K, D)
        fused = self.fusers[level](tokens)[:, : current.shape[1]]
        return self.proj(fused) + current

    def __call__(self, feats: Sequence, kpts_per_level, vis,
                 accumulate: bool = True):
        """Pool current features at keypoints, fuse with memory, and
        (in training) accumulate into the running sums. Returns a list of
        (B, K, D) fused features per level."""
        outs = []
        for i, (f, kp) in enumerate(zip(feats, kpts_per_level)):
            pooled = gaussian_pool(f, kp, vis)
            outs.append(self.fuse_with_meta_features(pooled, i))
        if accumulate:
            self.accumulate_features(feats, kpts_per_level, vis)
        return outs
