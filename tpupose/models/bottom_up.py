"""Bottom-up multi-person pose: heatmaps + associative-embedding tags.

Completes the bottom-up half of the 2D-HPE taxonomy the reference surveys
(study/; its code keeps DeepPose under HPE/models/reference/bottom_up/ but
ships no multi-person bottom-up model). One trunk predicts 2K channels —
K joint heatmaps and K scalar tag maps — trained with losses/ae.ae_loss
and grouped at inference by ops/ae_decode.decode_ae, detector-free.

Trunks (both stride-4 output, the bottom-up standard):
- hrnet_*: the HRNet high-resolution branch + 1x1 conv (HigherHRNet's
  base configuration, minus the extra x2 deconv stage).
- resnet*: SimpleBaseline-style deconv stack (HeatmapHead with 2K output
  channels).

bf16 trunk, fp32 final conv (same policy as every other head here).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tpupose.models.backbones.hrnet import HRNet
from tpupose.models.backbones.resnet import ResNet
from tpupose.models.heads import HeatmapHead


class BottomUpPose(nn.Module):
    backbone: str = "hrnet_w32"
    num_keypoints: int = 17
    deconv_channels: Sequence[int] = (256, 256, 256)
    dtype: Any = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        out_ch = 2 * self.num_keypoints  # K heatmaps + K tags
        if self.backbone.startswith("hrnet"):
            f = HRNet.from_name(self.backbone, dtype=self.dtype,
                                remat=self.remat)(x, train)
            return nn.Conv(out_ch, (1, 1), dtype=jnp.float32)(f)
        f = ResNet.from_name(self.backbone, dtype=self.dtype,
                             remat=self.remat)(x, train)
        return HeatmapHead(out_ch, self.deconv_channels,
                           dtype=self.dtype)(f, train=train)

    @staticmethod
    def split(pred):
        """(B, H, W, 2K) -> (heatmaps, tags), both (B, K, H, W) fp32 in
        the decode module's NKHW convention."""
        K = pred.shape[-1] // 2
        hm = jnp.transpose(pred[..., :K], (0, 3, 1, 2)).astype(jnp.float32)
        tg = jnp.transpose(pred[..., K:], (0, 3, 1, 2)).astype(jnp.float32)
        return hm, tg
