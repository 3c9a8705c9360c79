"""Pretrained-weight registry + loading glue.

Capability parity with the reference's size tables and local checkpoint
path registries (reference: HPE/models/backbones/dinov3convnext.py:93-117
`convnext_sizes`/`*_ckps`, dinov3vit.py:143-172 `vit_sizes`,
pose/pose/model/utils.py:33-134 model-name registries, and the `Weights`
enum LVD1689M/SAT493M in HPE/models/utils.py:29-31).

`load_pretrained` converts a torch .pth into the matching flax subtree and
merges it into a model's params (used by Builder when
cfg.model.pretrained is set).
"""

from __future__ import annotations

import enum
import os

from tpupose.utils.logging import printS, printW


class Weights(enum.Enum):
    """Pretraining datasets of the DINOv3 releases (reference
    HPE/models/utils.py:29-31)."""

    LVD1689M = "lvd1689m"
    SAT493M = "sat493m"


# model-name -> (family, size, depth-or-depths) registry
# (the MODEL_TO_NUM_LAYERS analog, pose/pose/model/utils.py:33-134)
DINO_MODELS = {
    "dinov3_convnext_tiny": ("convnext", "tiny"),
    "dinov3_convnext_small": ("convnext", "small"),
    "dinov3_convnext_base": ("convnext", "base"),
    "dinov3_convnext_large": ("convnext", "large"),
    "dinov3_vits16": ("vit", "small"),
    "dinov3_vitb16": ("vit", "base"),
    "dinov3_vitl16": ("vit", "large"),
    "dinov3_vith16plus": ("vit", "huge_plus"),
    "dinov3_vit7b16": ("vit", "7b"),
}


def convert_checkpoint(pth_path: str, backbone: str) -> dict:
    """torch .pth -> flax params tree for the named backbone."""
    from tpupose.models.backbones.convnext import get_convnext_arch
    from tpupose.models.backbones.vit import VIT_SIZES
    from tpupose.utils.convert import convert_convnext, convert_resnet, \
        convert_vit, load_pth

    sd = load_pth(pth_path)
    if "convnext" in backbone:
        size = backbone.split("_")[-1]
        return convert_convnext(sd, get_convnext_arch(size)["depths"])
    if "vit" in backbone:
        for size, spec in VIT_SIZES.items():
            if size in backbone or backbone.endswith(size):
                return convert_vit(sd, spec["depth"])
        return convert_vit(sd, VIT_SIZES["small"]["depth"])
    if "resnet" in backbone:
        from tpupose.models.backbones.resnet import resnet_spec

        block, sizes = resnet_spec(backbone)
        return convert_resnet(sd, sizes, bottleneck=(block.__name__ == "Bottleneck"))
    raise ValueError(f"no converter for backbone {backbone!r}")


def load_pretrained(params: dict, pth_path: str, backbone: str,
                    subtree: str | None = None, batch_stats: dict | None = None):
    """Merge converted backbone weights into a model's variable trees.

    subtree: the param key holding the backbone (e.g. 'ConvNeXt_0',
    'ResNet_0', 'DinoViT_0'); auto-detected when None.

    Returns (params, batch_stats): BN running statistics from the converted
    checkpoint (e.g. convert_resnet's batch_stats subtree) are merged into
    `batch_stats` so pretrained backbones don't run on random-init BN stats.
    """
    batch_stats = dict(batch_stats) if batch_stats else {}
    if not os.path.exists(pth_path):
        printW(f"pretrained checkpoint not found: {pth_path}; "
               "keeping random init")
        return params, batch_stats
    tree = convert_checkpoint(pth_path, backbone)
    bb_params = tree["params"] if "params" in tree else tree
    if subtree is None:
        candidates = [k for k in params
                      if k.split("_")[0] in ("ConvNeXt", "ResNet", "DinoViT",
                                             "HRNet")]
        if not candidates:
            raise ValueError(f"no backbone subtree found among {list(params)}")
        subtree = candidates[0]
    merged = dict(params)
    merged[subtree] = bb_params
    if tree.get("batch_stats"):
        batch_stats[subtree] = tree["batch_stats"]
    printS(f"loaded pretrained backbone from {pth_path} into {subtree}")
    return merged, batch_stats
