"""SimpleBaseline: ResNet + deconv heatmap head (graded config #1/#2,
BASELINE.json:7-8). Top-down single-person pose at 256x192 -> 64x48
heatmaps."""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tpupose.models.backbones.resnet import ResNet
from tpupose.models.heads import HeatmapHead


class SimpleBaseline(nn.Module):
    backbone: str = "resnet50"
    num_keypoints: int = 17
    deconv_channels: Sequence[int] = (256, 256, 256)
    dtype: Any = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ResNet.from_name(self.backbone, dtype=self.dtype,
                             remat=self.remat)(x, train=train)
        return HeatmapHead(self.num_keypoints, self.deconv_channels,
                           dtype=self.dtype)(x, train=train)
