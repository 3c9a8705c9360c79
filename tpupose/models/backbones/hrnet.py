"""HRNet-W32/W48 multi-resolution backbone + pose head (graded configs
BASELINE.json:9-10).

The reference names HRNet-style multi-resolution conv as a target backbone
(driver north star; the reference repo itself covers the capability via its
survey + config surface). Architecture follows the canonical HRNet-W32/W48
pose network: a stride-4 stem, a Bottleneck stage, then three multi-branch
stages exchanging information through fuse layers; the final head runs on
the highest-resolution branch.

TPU design notes: NHWC; fuse-layer upsampling is NEAREST-neighbor (the
canonical HRNet choice: Upsample(scale_factor=2**(j-i), mode='nearest')),
implemented as a broadcast+reshape — zero FLOPs, pure relayout, no gather;
widths are multiples of 32/48 so the channel dims tile the MXU/VPU lanes
well; bf16 compute.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpupose.models.backbones.resnet import BasicBlock, Bottleneck
from tpupose.models.remat import block_call


def _upsample_to(x, hw, dtype):
    B, H, W, C = x.shape
    fh, fw = hw[0] // H, hw[1] // W
    if fh * H == hw[0] and fw * W == hw[1] and fh >= 1 and fw >= 1:
        # nearest by integer factor: broadcast + reshape (a relayout XLA
        # folds into the surrounding add/ReLU — no resize gather)
        x = jnp.broadcast_to(x[:, :, None, :, None, :],
                             (B, H, fh, W, fw, C))
        return x.reshape(B, hw[0], hw[1], C).astype(dtype)
    return jax.image.resize(x, (B, hw[0], hw[1], C),
                            method="nearest").astype(dtype)


class _ConvBN(nn.Module):
    filters: int
    kernel: int = 3
    strides: int = 1
    relu: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.filters, (self.kernel, self.kernel),
                    (self.strides, self.strides), padding=self.kernel // 2,
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x) if self.relu else x


class _Branch(nn.Module):
    """num_blocks BasicBlocks at constant width."""

    width: int
    num_blocks: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        for _ in range(self.num_blocks):
            x = BasicBlock(filters=self.width, dtype=self.dtype)(x, train=train)
        return x


class _FuseLayer(nn.Module):
    """Full cross-resolution exchange: every output branch sums transformed
    inputs from every branch (downsample via stride-2 convs, upsample via
    1x1 conv + bilinear)."""

    widths: Sequence[int]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, xs, train: bool = True):
        n = len(self.widths)
        outs = []
        for i in range(n):  # output branch
            acc = None
            for j in range(n):  # input branch
                y = xs[j]
                if j > i:      # lower res -> upsample
                    y = _ConvBN(self.widths[i], 1, relu=False,
                                dtype=self.dtype)(y, train)
                    y = _upsample_to(y, xs[i].shape[1:3], self.dtype)
                elif j < i:    # higher res -> downsample with stride-2 convs
                    for k in range(i - j):
                        last = k == i - j - 1
                        y = _ConvBN(self.widths[i] if last else self.widths[j],
                                    3, strides=2, relu=not last,
                                    dtype=self.dtype)(y, train)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


class _Stage(nn.Module):
    """num_modules x (branches + fuse)."""

    widths: Sequence[int]
    num_modules: int
    num_blocks: int = 4
    dtype: Any = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, xs, train: bool = True):
        for _ in range(self.num_modules):
            xs = [block_call(_Branch(w, self.num_blocks, dtype=self.dtype),
                             x, train, self.remat)
                  for w, x in zip(self.widths, xs)]
            xs = _FuseLayer(self.widths, dtype=self.dtype)(xs, train)
        return xs


HRNET_SPECS = {
    "hrnet_w32": {"width": 32, "modules": (1, 4, 3)},
    "hrnet_w48": {"width": 48, "modules": (1, 4, 3)},
    "hrnet_w18": {"width": 18, "modules": (1, 4, 3)},
}


class HRNet(nn.Module):
    """HRNet backbone; returns the high-resolution (stride-4) feature map."""

    width: int = 32
    modules: Sequence[int] = (1, 4, 3)
    dtype: Any = jnp.bfloat16
    remat: bool = False  # checkpoint each branch (models/remat.py)

    @classmethod
    def from_name(cls, name: str, dtype=jnp.bfloat16, remat: bool = False):
        if name not in HRNET_SPECS:
            raise ValueError(f"unknown hrnet {name!r}; have {sorted(HRNET_SPECS)}")
        s = HRNET_SPECS[name]
        return cls(width=s["width"], modules=s["modules"], dtype=dtype,
                   remat=remat)

    @nn.compact
    def __call__(self, x, train: bool = True):
        w = self.width
        # stem: two stride-2 3x3 convs -> stride 4
        x = _ConvBN(64, 3, strides=2, dtype=self.dtype)(x, train)
        x = _ConvBN(64, 3, strides=2, dtype=self.dtype)(x, train)
        # stage1: 4 Bottlenecks at width 64 (expansion 4 -> 256 channels)
        for _ in range(4):
            x = block_call(Bottleneck(filters=64, dtype=self.dtype),
                           x, train, self.remat)
        # transition to 2 branches
        b0 = _ConvBN(w, 3, dtype=self.dtype)(x, train)
        b1 = _ConvBN(w * 2, 3, strides=2, dtype=self.dtype)(x, train)
        xs = [b0, b1]
        xs = _Stage((w, w * 2), self.modules[0], dtype=self.dtype,
                    remat=self.remat)(xs, train)
        # transition to 3 branches
        xs = xs + [_ConvBN(w * 4, 3, strides=2, dtype=self.dtype)(xs[-1], train)]
        xs = _Stage((w, w * 2, w * 4), self.modules[1], dtype=self.dtype,
                    remat=self.remat)(xs, train)
        # transition to 4 branches
        xs = xs + [_ConvBN(w * 8, 3, strides=2, dtype=self.dtype)(xs[-1], train)]
        xs = _Stage((w, w * 2, w * 4, w * 8), self.modules[2],
                    dtype=self.dtype, remat=self.remat)(xs, train)
        return xs[0]  # stride-4 high-resolution map


class HRNetPose(nn.Module):
    """HRNet + 1x1 heatmap head (the top-down graded model). Heatmaps come
    out at stride 4 (256x192 -> 64x48) directly — no deconvs needed."""

    variant: str = "hrnet_w32"
    num_keypoints: int = 17
    dtype: Any = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = HRNet.from_name(self.variant, dtype=self.dtype,
                            remat=self.remat)(x, train=train)
        return nn.Conv(self.num_keypoints, (1, 1), dtype=jnp.float32)(f)
