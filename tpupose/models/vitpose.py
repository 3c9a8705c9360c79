"""ViTPose: plain (non-hierarchical) ViT backbone + lightweight heatmap
decoder — the top-down transformer family the DINOv3 backbones in this repo
naturally serve.

Capability context: the reference exposes its DINOv3 ViT solely through the
single-stage YOLO-style DINOv3Pose (reference: HPE/models/pose.py:9-65,
HPE/models/backbones/dinov3vit.py:86-127 per-block feature maps). This model
closes the obvious missing combination — the same pretrained ViT driving the
*graded* top-down heatmap protocol (256x192 crops, JointsMSE, DARK decode,
flip-test; BASELINE.json:7-8) — so a reference user holding DINOv3 ViT
weights can run the official COCO top-down pipeline with them.

TPU design notes:
- Backbone is models/backbones/vit.DinoViT (2D RoPE, storage tokens,
  Pallas flash attention): one fused program, static 16x12 token grid at
  256x192, bf16 throughout. DINOv3 .pth weights load via utils/convert.
- Decoder options mirror the ViTPose paper's ablation:
  "classic"  — 2x [deconv4x4 s2 + BN + ReLU] then 1x1 conv: /16 -> /4,
               i.e. exactly heatmap_size = image_size / 4 like SimpleBaseline.
  "simple"   — bilinear 4x upsample + 3x3 conv + ReLU + 1x1 conv: cheaper,
               near-par accuracy in the paper; upsample+conv fuses in XLA.
- Final conv fp32 for stable MSE targets (same policy as heads.HeatmapHead).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpupose.models.backbones.vit import DinoViT


class ViTPose(nn.Module):
    backbone: str = "vit_small"         # vit_{small,base,large,...} (VIT_SIZES)
    num_keypoints: int = 17
    decoder: str = "classic"            # classic | simple
    deconv_channels: tuple = (256, 256)
    freeze_backbone: bool = False
    dtype: Any = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        size = self.backbone.replace("dinov3_", "").replace("vit_", "")
        vit = DinoViT.from_size(size, dtype=self.dtype, remat=self.remat)
        feats = vit(x, train=train)["feature_map"]  # (B, H/16, W/16, C)
        if self.freeze_backbone:
            # reference freezes the DINOv3 backbone (HPE/models/pose.py:47-49);
            # same policy here so only the decoder trains
            feats = jax.lax.stop_gradient(feats)

        if self.decoder == "classic":
            h = feats
            for ch in self.deconv_channels:
                h = nn.ConvTranspose(ch, (4, 4), strides=(2, 2), padding="SAME",
                                     use_bias=False, dtype=self.dtype)(h)
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype)(h)
                h = nn.relu(h)
            return nn.Conv(self.num_keypoints, (1, 1), dtype=jnp.float32)(h)
        if self.decoder == "simple":
            B, Hf, Wf, C = feats.shape
            h = jnp.asarray(feats, self.dtype)
            # 4x bilinear upsample: /16 feature grid -> /4 heatmap grid
            h = jax.image.resize(h, (B, Hf * 4, Wf * 4, C), method="bilinear")
            h = nn.Conv(self.deconv_channels[-1], (3, 3), dtype=self.dtype)(h)
            h = nn.relu(h)
            return nn.Conv(self.num_keypoints, (1, 1), dtype=jnp.float32)(h)
        raise ValueError(f"unknown decoder {self.decoder!r}")
