"""Prediction heads.

HeatmapHead: SimpleBaseline deconv head (graded config, BASELINE.json).
RegressionHead: DeepPose-style direct coordinate regression
(reference: HPE/models/reference/bottom_up/regression/models/DeepPose.py:4-27).
ClassifyHead: conv -> GAP -> dropout -> linear
(reference: HPE/models/nn/modules/head.py:9-24).

The YOLO-style PoseHead/DetectHead live in tpupose/models/yolo_head.py.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class HeatmapHead(nn.Module):
    """SimpleBaseline head: N deconv(4x4, stride 2) + BN + ReLU, then a
    1x1 conv to K heatmap channels. NHWC; final conv in fp32 for stable
    MSE targets."""

    num_keypoints: int
    deconv_channels: Sequence[int] = (256, 256, 256)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        for ch in self.deconv_channels:
            # NOTE (measured, v5e r2): phase-decomposed "sub-pixel"
            # deconv lowerings (4 shifted 2x2 convs + interleave, or one
            # 3x3 phase conv + depth_to_space) were tried and are SLOWER
            # than XLA's native conv_transpose here — bf16 e2e R50 infer
            # 11,961 (native) vs 11,002 (phase4) vs 8,190 (k3) img/s, and
            # int8 14,109 vs 11,227 vs 9,991. The TPU conv emitter handles
            # lhs-dilation without paying for stuffed zeros; don't re-try.
            x = nn.ConvTranspose(ch, (4, 4), strides=(2, 2), padding="SAME",
                                 use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
            x = nn.relu(x)
        x = nn.Conv(self.num_keypoints, (1, 1), dtype=jnp.float32)(x)
        return x  # (B, Hh, Wh, K)


class RegressionHead(nn.Module):
    """DeepPose: GAP -> fc -> (B, K, 2) normalized coords."""

    num_keypoints: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = jnp.mean(x, axis=(1, 2))  # GAP over H, W
        x = nn.Dense(2 * self.num_keypoints, dtype=jnp.float32)(x)
        return x.reshape(x.shape[0], self.num_keypoints, 2)


class ClassifyHead(nn.Module):
    """conv -> GAP -> dropout -> linear; softmax applied by callers at eval
    (reference: HPE/models/nn/modules/head.py:9-24)."""

    num_classes: int
    hidden: int = 1280
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.hidden, (1, 1), dtype=self.dtype)(x)
        x = nn.silu(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32)(x)
