"""PyTorch -> Flax weight conversion.

The reference loads pretrained DINOv3 ConvNeXt/ViT weights from .pth files
(reference: HPE/models/backbones/dinov3convnext.py:40-42 local-ckpt hub
load; pose/pose/model/utils.py:122-134 ckpt path registry). The TPU build
needs those weights in Flax trees (SURVEY.md §2.9 / §7 "hard parts").

This module provides the mechanical mapping rules
(OIHW->HWIO conv kernels, (out,in)->(in,out) linears, BN/LN splits) and
tree builders for the three backbone families. Tested for functional
parity against torch primitives in tests/test_convert.py.
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np


def t2n(t):
    """torch tensor -> numpy (works on any object with .detach or ndarray)."""
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def conv_kernel(w) -> np.ndarray:
    """torch Conv2d weight (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return np.transpose(t2n(w), (2, 3, 1, 0))


def dwconv_kernel(w) -> np.ndarray:
    """torch depthwise Conv2d weight (C, 1, kh, kw) -> flax
    (kh, kw, 1, C) for feature_group_count=C."""
    return np.transpose(t2n(w), (2, 3, 1, 0))


def deconv_kernel(w) -> np.ndarray:
    """torch ConvTranspose2d weight (I, O, kh, kw) -> flax ConvTranspose
    kernel (kh, kw, I, O).

    torch's transposed conv is the gradient of a correlation (implicitly
    flipped); flax ConvTranspose(transpose_kernel=False) runs a
    fractionally-strided correlation with the kernel as-is — so the spatial
    dims must be rotated 180 degrees for numerical parity
    (tests/test_convert.py::test_deconv_parity).
    """
    return np.transpose(t2n(w), (2, 3, 0, 1))[::-1, ::-1].copy()


def linear_kernel(w) -> np.ndarray:
    """torch Linear weight (out, in) -> flax Dense kernel (in, out)."""
    return np.transpose(t2n(w), (1, 0))


def bn_params(prefix: str, sd: Mapping):
    """BatchNorm: returns (params, stats) dicts for flax."""
    return (
        {"scale": t2n(sd[f"{prefix}.weight"]),
         "bias": t2n(sd[f"{prefix}.bias"])},
        {"mean": t2n(sd[f"{prefix}.running_mean"]),
         "var": t2n(sd[f"{prefix}.running_var"])},
    )


def ln_params(prefix: str, sd: Mapping):
    return {"scale": t2n(sd[f"{prefix}.weight"]),
            "bias": t2n(sd[f"{prefix}.bias"])}


# ---------------------------------------------------------------------------
# ResNet (torchvision naming: conv1, bn1, layerX.Y.convZ/bnZ/downsample)
# ---------------------------------------------------------------------------

def convert_resnet(sd: Mapping, stage_sizes, bottleneck: bool = True):
    """torchvision-style ResNet state dict -> {params, batch_stats} matching
    tpupose.models.backbones.resnet.ResNet's auto-generated names."""
    params: dict = {}
    stats: dict = {}

    def put(path, kernel=None, bn_prefix=None):
        if kernel is not None:
            params[path] = {"kernel": kernel}
        if bn_prefix is not None:
            p, s = bn_params(bn_prefix, sd)
            params[path] = p
            stats[path] = s

    put("Conv_0", kernel=conv_kernel(sd["conv1.weight"]))
    put("BatchNorm_0", bn_prefix="bn1")

    block_name = "Bottleneck" if bottleneck else "BasicBlock"
    n_convs = 3 if bottleneck else 2
    bidx = 0
    for li, size in enumerate(stage_sizes):
        for j in range(size):
            t = f"layer{li + 1}.{j}"
            bp: dict = {}
            bs: dict = {}
            for c in range(n_convs):
                bp[f"Conv_{c}"] = {"kernel": conv_kernel(sd[f"{t}.conv{c + 1}.weight"])}
                p, s = bn_params(f"{t}.bn{c + 1}", sd)
                bp[f"BatchNorm_{c}"] = p
                bs[f"BatchNorm_{c}"] = s
            if f"{t}.downsample.0.weight" in sd:
                bp[f"Conv_{n_convs}"] = {
                    "kernel": conv_kernel(sd[f"{t}.downsample.0.weight"])}
                p, s = bn_params(f"{t}.downsample.1", sd)
                bp[f"BatchNorm_{n_convs}"] = p
                bs[f"BatchNorm_{n_convs}"] = s
            params[f"{block_name}_{bidx}"] = bp
            stats[f"{block_name}_{bidx}"] = bs
            bidx += 1
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# DINOv3 ConvNeXt (naming: downsample_layers.X, stages.X.Y.{dwconv,norm,
# pwconv1,pwconv2,gamma})
# ---------------------------------------------------------------------------

def convert_convnext(sd: Mapping, depths):
    """DINOv3/facebook ConvNeXt state dict -> {params} for
    tpupose.models.backbones.convnext.ConvNeXt."""
    params: dict = {}
    params["Conv_0"] = {
        "kernel": conv_kernel(sd["downsample_layers.0.0.weight"]),
        "bias": t2n(sd["downsample_layers.0.0.bias"]),
    }
    params["LayerNorm_0"] = ln_params("downsample_layers.0.1", sd)
    # between-stage downsamplers: LN then conv
    for i in range(1, len(depths)):
        params[f"LayerNorm_{i}"] = ln_params(f"downsample_layers.{i}.0", sd)
        params[f"Conv_{i}"] = {
            "kernel": conv_kernel(sd[f"downsample_layers.{i}.1.weight"]),
            "bias": t2n(sd[f"downsample_layers.{i}.1.bias"]),
        }
    bidx = 0
    for si, depth in enumerate(depths):
        for j in range(depth):
            t = f"stages.{si}.{j}"
            blk = {
                "Conv_0": {"kernel": dwconv_kernel(sd[f"{t}.dwconv.weight"]),
                           "bias": t2n(sd[f"{t}.dwconv.bias"])},
                "LayerNorm_0": ln_params(f"{t}.norm", sd),
                "Dense_0": {"kernel": linear_kernel(sd[f"{t}.pwconv1.weight"]),
                            "bias": t2n(sd[f"{t}.pwconv1.bias"])},
                "Dense_1": {"kernel": linear_kernel(sd[f"{t}.pwconv2.weight"]),
                            "bias": t2n(sd[f"{t}.pwconv2.bias"])},
            }
            if f"{t}.gamma" in sd:
                blk["gamma"] = t2n(sd[f"{t}.gamma"])
            if f"{t}.grn.gamma" in sd:  # V2
                blk["GRN_0"] = {"gamma": t2n(sd[f"{t}.grn.gamma"]).reshape(-1),
                                "beta": t2n(sd[f"{t}.grn.beta"]).reshape(-1)}
            params[f"ConvNeXtBlock_{bidx}"] = blk
            bidx += 1
    return {"params": params}


# ---------------------------------------------------------------------------
# DINOv3 ViT (naming: patch_embed.proj, cls_token, storage_tokens,
# blocks.X.{norm1,attn.qkv,attn.proj,ls1,norm2,mlp.fc1,mlp.fc2,ls2}, norm)
# ---------------------------------------------------------------------------

def convert_vit(sd: Mapping, depth: int):
    params: dict = {}
    params["patch_embed"] = {
        "kernel": conv_kernel(sd["patch_embed.proj.weight"]),
        "bias": t2n(sd["patch_embed.proj.bias"]),
    }
    params["cls_token"] = t2n(sd["cls_token"])
    key = "storage_tokens" if "storage_tokens" in sd else "register_tokens"
    if key in sd:
        dim = params["patch_embed"]["bias"].shape[0]
        params["storage_tokens"] = t2n(sd[key]).reshape(1, -1, dim)
    for i in range(depth):
        t = f"blocks.{i}"
        blk = {
            "LayerNorm_0": ln_params(f"{t}.norm1", sd),
            "RopeAttention_0": {
                "qkv": {"kernel": linear_kernel(sd[f"{t}.attn.qkv.weight"]),
                        "bias": t2n(sd[f"{t}.attn.qkv.bias"])},
                "proj": {"kernel": linear_kernel(sd[f"{t}.attn.proj.weight"]),
                         "bias": t2n(sd[f"{t}.attn.proj.bias"])},
            },
            "ls1": t2n(sd.get(f"{t}.ls1.gamma", sd.get(f"{t}.ls1.weight"))),
            "LayerNorm_1": ln_params(f"{t}.norm2", sd),
            "Dense_0": {"kernel": linear_kernel(sd[f"{t}.mlp.fc1.weight"]),
                        "bias": t2n(sd[f"{t}.mlp.fc1.bias"])},
            "Dense_1": {"kernel": linear_kernel(sd[f"{t}.mlp.fc2.weight"]),
                        "bias": t2n(sd[f"{t}.mlp.fc2.bias"])},
            "ls2": t2n(sd.get(f"{t}.ls2.gamma", sd.get(f"{t}.ls2.weight"))),
        }
        params[f"ViTBlock_{i}"] = blk
    params["norm"] = ln_params("norm", sd)
    return {"params": params}


def load_pth(path: str) -> dict:
    """Load a torch .pth/.pt checkpoint into a flat numpy state dict.

    Tries weights_only=True first (no arbitrary-code-execution surface);
    falls back to a full unpickle with an explicit warning for legacy
    checkpoints that store non-tensor objects.
    """
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        from tpupose.utils.logging import printW

        printW(f"{path}: not loadable with weights_only=True; falling back "
               "to full unpickle — only do this for trusted checkpoints")
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: t2n(v) for k, v in obj.items() if hasattr(v, "shape")}
