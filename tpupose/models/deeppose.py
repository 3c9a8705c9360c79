"""DeepPose — direct coordinate regression baseline.

Capability parity with the reference DeepPose
(reference: HPE/models/reference/bottom_up/regression/models/DeepPose.py:4-27):
timm resnet50 backbone + fc -> 2K outputs reshaped (B, 2, K). Here the
backbone comes from the native ResNet family (the timm role per
SURVEY.md §2.9) and the output is (B, K, 2) (kpt-last, consistent with the
rest of the framework)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from tpupose.models.backbones.resnet import ResNet
from tpupose.models.heads import RegressionHead


class DeepPose(nn.Module):
    backbone: str = "resnet50"
    num_keypoints: int = 17
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = ResNet.from_name(self.backbone, dtype=self.dtype)(x, train=train)
        return RegressionHead(self.num_keypoints, dtype=self.dtype)(f, train)
