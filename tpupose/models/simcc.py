"""SimCC: coordinate classification pose head (Li et al., ECCV 2022).

Beyond-parity serving-oriented model family: the deconv heatmap head of
SimpleBaseline (reference HPE capability, graded config 1) is replaced by
per-keypoint 1D x/y bin classification — the costly upsampling deconvs
(~12% of the R50 e2e step, see docs/ARCHITECTURE.md) and the 2D DARK
decode disappear, while localization granularity IMPROVES: bins sample the
input at 1/split_ratio px (0.5 px at ratio 2) vs the heatmap's stride-4
grid.

TPU shape: backbone -> 1x1 conv to K channels -> per-keypoint flatten ->
two Dense projections (MXU matmuls) to Wb/Hb bins. Everything static; the
whole eval program is forward + softmax + argmax + a 3-point parabolic
refinement (ops/decode.decode_simcc).

Convention: `cfg.model.heatmap_size` for this family is the BIN grid
(Hb, Wb) = image_size * split_ratio, so the existing dataset joint
transform, affine back-projection, and evaluator plumbing all apply
unchanged (bins are just a finer "heatmap" grid).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tpupose.models.backbones.hrnet import HRNet
from tpupose.models.backbones.resnet import ResNet


class SimCCHead(nn.Module):
    """1x1 conv -> per-keypoint flatten -> Dense to x bins + Dense to y
    bins. Logits in fp32 for a stable softmax/KL."""

    num_keypoints: int
    x_bins: int
    y_bins: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.num_keypoints, (1, 1), dtype=self.dtype,
                    name="kpt_conv")(x)
        B, h, w, K = x.shape
        t = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, K, h * w)
        t = t.astype(jnp.float32)
        x_logits = nn.Dense(self.x_bins, dtype=jnp.float32, name="mlp_x")(t)
        y_logits = nn.Dense(self.y_bins, dtype=jnp.float32, name="mlp_y")(t)
        return x_logits, y_logits                 # (B, K, Wb), (B, K, Hb)


class SimCCPose(nn.Module):
    """backbone (ResNet or HRNet) + SimCC head. Bin counts derive from the
    input resolution: Wb = W * split_ratio, Hb = H * split_ratio."""

    backbone: str = "resnet50"
    num_keypoints: int = 17
    split_ratio: float = 2.0
    dtype: Any = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        B, H, W, _ = x.shape
        if self.backbone.startswith("hrnet"):
            # HRNet's stride-4 high-res branch: keep its spatial detail
            f = HRNet.from_name(self.backbone, dtype=self.dtype,
                                remat=self.remat)(x,
                                                                 train=train)
        else:
            f = ResNet.from_name(self.backbone, dtype=self.dtype,
                                 remat=self.remat)(x,
                                                                  train=train)
        return SimCCHead(self.num_keypoints,
                         x_bins=int(W * self.split_ratio),
                         y_bins=int(H * self.split_ratio),
                         dtype=self.dtype)(f, train=train)
