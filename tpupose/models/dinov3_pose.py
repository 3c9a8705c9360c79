"""DINOv3Pose — the flagship single-stage multi-instance pose model.

Capability parity with the reference DINOv3Pose
(reference: HPE/models/pose.py:9-65; twin pose/pose/model/pose/
dinov3pose.py:10-55): parse `dinov3_{convnext,vit}_{size}` -> build
backbone; optional full backbone freeze (pose.py:47-49); stages 2-4
features -> FeatureAdaptor to target channels [192, 384, 768] -> SPPF on
the deepest -> PAN fuse -> PoseHead.

TPU notes: backbone freeze = stop_gradient on its features + an optimizer
mask (engine/optimizers.py), replacing DDP find_unused_parameters. For a
ViT backbone, three intermediate depths provide the 3 pyramid levels and
are resized to strides 8/16/32 (the reference's ViT variant resizes token
maps the same way).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpupose.models.backbones.convnext import ConvNeXt
from tpupose.models.backbones.vit import DinoViT, VIT_SIZES
from tpupose.models.necks import PAN, SPPF, FeatureAdaptor
from tpupose.models.yolo_head import PoseHead


# DINOv3 release shorthand (reference vit_sizes/ckpt tables,
# HPE/models/backbones/dinov3vit.py:143-172)
_VIT_SHORTHAND = {
    "vits16": "small", "vits16plus": "small_plus", "vitb16": "base",
    "vitl16": "large", "vith16plus": "huge_plus", "vit7b16": "7b",
}


def _parse_backbone(name: str):
    """'dinov3_convnext_tiny' -> ('convnext', 'tiny'); also accepts
    'convnext_tiny' / 'vit_small' and the DINOv3 release shorthands
    ('dinov3_vits16', 'dinov3_vith16plus', ...)."""
    parts = name.split("_")
    if parts[0] == "dinov3":
        parts = parts[1:]
    if parts[0] in _VIT_SHORTHAND:
        return "vit", _VIT_SHORTHAND[parts[0]]
    family = parts[0]
    size = "_".join(parts[1:]) or ("tiny" if family == "convnext" else "small")
    if family not in ("convnext", "vit"):
        raise ValueError(f"unknown backbone family in {name!r}")
    return family, size


class DINOv3Pose(nn.Module):
    backbone: str = "dinov3_convnext_tiny"
    num_keypoints: int = 4
    num_classes: int = 7
    neck_channels: Sequence[int] = (192, 384, 768)
    strides: Sequence[int] = (8, 16, 32)
    freeze_backbone: bool = True
    kpt_dim: int = 3
    reg_max: int = 0                # >0: v8-style DFL box branch on the head
    dtype: Any = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        family, size = _parse_backbone(self.backbone)
        if family == "convnext":
            feats = ConvNeXt.from_size(size, dtype=self.dtype,
                                       remat=self.remat)(x, train=train)
            feats = feats[1:]  # stages 2-4: strides 8, 16, 32
        else:
            depth = VIT_SIZES[size]["depth"]
            ids = (depth // 3 - 1, 2 * depth // 3 - 1, depth - 1)
            out = DinoViT.from_size(size, intermediates=ids, remat=self.remat,
                                    dtype=self.dtype)(x, train=train)
            m = out["intermediates"]
            B, H, W, _ = x.shape
            lvls = []
            for i, s in zip(ids, self.strides):
                f = m[i]
                th, tw = H // s, W // s
                f = jax.image.resize(f, (f.shape[0], th, tw, f.shape[-1]),
                                     method="bilinear").astype(f.dtype)
                lvls.append(f)
            feats = lvls
        if self.freeze_backbone:
            # gradient barrier (the requires_grad=False analog,
            # HPE/models/pose.py:47-49); the optimizer additionally masks
            # backbone params so momentum stays empty
            feats = [jax.lax.stop_gradient(f) for f in feats]

        feats = FeatureAdaptor(self.neck_channels, dtype=self.dtype)(feats, train)
        feats[-1] = SPPF(self.neck_channels[-1], dtype=self.dtype)(feats[-1], train)
        feats = PAN(self.neck_channels, dtype=self.dtype)(feats, train)
        return PoseHead(num_classes=self.num_classes,
                        kpt_shape=(self.num_keypoints, self.kpt_dim),
                        strides=tuple(self.strides),
                        reg_max=self.reg_max,
                        dtype=self.dtype)(feats, train=train)

    @nn.nowrap
    def forward_features(self, variables, x):
        """Backbone features only (reference DINOv3Pose.forward_features,
        HPE/models/pose.py:50-65 — exposed for both backbone families).
        Plain helper (nn.nowrap): builds a standalone backbone and applies
        the model's converted/trained backbone subtree to it."""
        family, size = _parse_backbone(self.backbone)
        if family == "convnext":
            bb = ConvNeXt.from_size(size, dtype=self.dtype)
            return bb.apply({"params": variables["params"]["ConvNeXt_0"]},
                            x, train=False)
        depth = VIT_SIZES[size]["depth"]
        ids = (depth // 3 - 1, 2 * depth // 3 - 1, depth - 1)
        bb = DinoViT.from_size(size, intermediates=ids, dtype=self.dtype)
        out = bb.apply({"params": variables["params"]["DinoViT_0"]},
                       x, train=False)
        return [out["intermediates"][i] for i in ids]
