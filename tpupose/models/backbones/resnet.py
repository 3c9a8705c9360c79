"""ResNet backbone family in Flax (NHWC, TPU-native).

Covers the backbone-zoo role timm plays in the reference (DeepPose uses
timm `resnet50`, reference: HPE/models/reference/bottom_up/regression/
models/DeepPose.py:4-27) and the SimpleBaseline-R50 graded config.

TPU design notes:
  - NHWC layout end-to-end (XLA's preferred conv layout on TPU).
  - compute dtype configurable (bf16 default); BN statistics in fp32.
  - returns all four stage features so FPN-style necks can consume it
    (the reference pulls stages 2-4 from its backbones,
    HPE/models/pose.py:51-57).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tpupose.models.remat import block_call

ModuleDef = Any


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype)
        residual = x
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides),
                    padding=1, use_bias=False, dtype=self.dtype)(x)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(y)
        y = norm()(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1), (self.strides, self.strides),
                               use_bias=False, dtype=self.dtype)(residual)
            residual = norm()(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype)
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides),
                    padding=1, use_bias=False, dtype=self.dtype)(y)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = norm()(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters * 4, (1, 1),
                               (self.strides, self.strides),
                               use_bias=False, dtype=self.dtype)(residual)
            residual = norm()(residual)
        return nn.relu(y + residual)


_SPECS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2)),
    "resnet34": (BasicBlock, (3, 4, 6, 3)),
    "resnet50": (Bottleneck, (3, 4, 6, 3)),
    "resnet101": (Bottleneck, (3, 4, 23, 3)),
    "resnet152": (Bottleneck, (3, 8, 36, 3)),
}


def resnet_spec(name: str):
    if name not in _SPECS:
        raise ValueError(f"unknown resnet {name!r}; have {sorted(_SPECS)}")
    return _SPECS[name]


class StemPool(nn.Module):
    """The stem 3x3/2 max-pool as a PARAM-LESS module (identical math to
    the inline `nn.max_pool` it replaces; no parameter-tree change) so
    the fused-stem serving interceptor (ops/pallas_stem.py) can swap it
    out: when the Pallas stem kernel computes conv+BN+relu+pool in one
    pass, this module is intercepted to identity."""

    @nn.compact
    def __call__(self, x):
        return nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))


class ResNet(nn.Module):
    """ResNet feature extractor. __call__ returns the C5 map; use
    `features=True` behavior via return_stages for multi-scale necks."""

    block_cls: ModuleDef
    stage_sizes: Sequence[int]
    dtype: Any = jnp.bfloat16
    return_stages: bool = False
    remat: bool = False  # checkpoint each residual block (models/remat.py)

    @classmethod
    def from_name(cls, name: str, dtype=jnp.bfloat16, return_stages: bool = False,
                  remat: bool = False):
        block, sizes = resnet_spec(name)
        return cls(block_cls=block, stage_sizes=sizes, dtype=dtype,
                   return_stages=return_stages, remat=remat)

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = StemPool(name="stem_pool")(x)
        feats = []
        for i, (size, filters) in enumerate(zip(self.stage_sizes, (64, 128, 256, 512))):
            for j in range(size):
                strides = 2 if (i > 0 and j == 0) else 1
                blk = self.block_cls(filters=filters, strides=strides,
                                     dtype=self.dtype)
                x = block_call(blk, x, train, self.remat)
            feats.append(x)
        if self.return_stages:
            return feats
        return x
