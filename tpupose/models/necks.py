"""Neck/building blocks: ConvBlock, Bottleneck(CSP), SPPF, PAN,
FeatureAdaptor, ConvNeXt block, DropPath.

Capability parity with the reference neck kit
(reference: HPE/models/nn/modules/block.py:1-271, byte-identical twin
pose/pose/model/nn/modules/block.py). All NHWC flax modules; bf16 compute.
PAN fuses FPN top-down + bottom-up with bilinear resize at each fuse
(block.py:117-157); SPPF is 3x maxpool-5 concat (block.py:102-114);
FeatureAdaptor is a 1x1 + 3x3 per level (block.py:236-254).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBlock(nn.Module):
    """conv + BN + SiLU with same-padding (autopad analog, block.py:12-45)."""

    filters: int
    kernel: int = 3
    strides: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        pad = self.kernel // 2
        x = nn.Conv(self.filters, (self.kernel, self.kernel),
                    (self.strides, self.strides), padding=pad,
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype)(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    """two ConvBlocks with optional residual (block.py:47-72)."""

    filters: int
    shortcut: bool = True
    expansion: float = 0.5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        hidden = int(self.filters * self.expansion)
        y = ConvBlock(hidden, 1, dtype=self.dtype)(x, train)
        y = ConvBlock(self.filters, 3, dtype=self.dtype)(y, train)
        if self.shortcut and x.shape[-1] == self.filters:
            return x + y
        return y


class BottleneckCSP(nn.Module):
    """CSP bottleneck stack (block.py:74-100)."""

    filters: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        hidden = int(self.filters * self.expansion)
        a = ConvBlock(hidden, 1, dtype=self.dtype)(x, train)
        b = ConvBlock(hidden, 1, dtype=self.dtype)(x, train)
        for _ in range(self.n):
            a = Bottleneck(hidden, self.shortcut, 1.0, dtype=self.dtype)(a, train)
        y = jnp.concatenate([a, b], axis=-1)
        return ConvBlock(self.filters, 1, dtype=self.dtype)(y, train)


class SPPF(nn.Module):
    """Spatial pyramid pooling - fast: 3 chained maxpool-5 + concat
    (block.py:102-114)."""

    filters: int
    pool_size: int = 5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        hidden = x.shape[-1] // 2
        x = ConvBlock(hidden, 1, dtype=self.dtype)(x, train)
        p = self.pool_size
        pad = p // 2
        pool = lambda v: nn.max_pool(v, (p, p), strides=(1, 1),
                                     padding=((pad, pad), (pad, pad)))
        y1 = pool(x)
        y2 = pool(y1)
        y3 = pool(y2)
        out = jnp.concatenate([x, y1, y2, y3], axis=-1)
        return ConvBlock(self.filters, 1, dtype=self.dtype)(out, train)


def _resize_to(x, hw):
    """bilinear resize NHWC to (H, W) (the reference fuses with
    F.interpolate(bilinear), block.py:131-150)."""
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[-1]),
                            method="bilinear").astype(x.dtype)


class PAN(nn.Module):
    """Path-aggregation network over 3 levels: FPN top-down then
    bottom-up, bilinear resize at each fuse (block.py:117-157).

    in/out: [P3, P4, P5] NHWC feature maps (fine -> coarse).
    """

    channels: Sequence[int]  # per-level output channels, e.g. (192, 384, 768)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = True):
        p3, p4, p5 = feats
        c3, c4, c5 = self.channels
        # top-down
        t4 = ConvBlock(c4, 1, dtype=self.dtype)(
            jnp.concatenate([p4, _resize_to(p5, p4.shape[1:3])], axis=-1), train)
        t4 = BottleneckCSP(c4, n=1, shortcut=False, dtype=self.dtype)(t4, train)
        t3 = ConvBlock(c3, 1, dtype=self.dtype)(
            jnp.concatenate([p3, _resize_to(t4, p3.shape[1:3])], axis=-1), train)
        t3 = BottleneckCSP(c3, n=1, shortcut=False, dtype=self.dtype)(t3, train)
        # bottom-up
        d4 = ConvBlock(c3, 3, strides=2, dtype=self.dtype)(t3, train)
        o4 = BottleneckCSP(c4, n=1, shortcut=False, dtype=self.dtype)(
            jnp.concatenate([d4, t4], axis=-1), train)
        d5 = ConvBlock(c4, 3, strides=2, dtype=self.dtype)(o4, train)
        o5 = BottleneckCSP(c5, n=1, shortcut=False, dtype=self.dtype)(
            jnp.concatenate([d5, p5], axis=-1), train)
        return [t3, o4, o5]


class FeatureAdaptor(nn.Module):
    """Per-level 1x1 + 3x3 channel adaptor (block.py:236-254): maps
    backbone stage channels to the neck's target channels."""

    channels: Sequence[int]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = True):
        out = []
        for f, c in zip(feats, self.channels):
            y = ConvBlock(c, 1, dtype=self.dtype)(f, train)
            y = ConvBlock(c, 3, dtype=self.dtype)(y, train)
            out.append(y)
        return out


class AttentionBlock(nn.Module):
    """Transformer block over an NHWC feature map (reference
    block.py:159-179): flatten to tokens, pre-LN MHSA + MLP with
    residuals, reshape back."""

    num_heads: int = 8
    mlp_ratio: float = 4.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        from tpupose.models.attention import Attention

        B, H, W, C = x.shape
        t = x.reshape(B, H * W, C)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(t)
        t = t + Attention(C, self.num_heads, dtype=self.dtype)(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(t)
        h = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(C, dtype=self.dtype)(h)
        t = t + h
        return t.reshape(B, H, W, C)


class DropPath(nn.Module):
    """Stochastic depth (block.py:181-200)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        if not train or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
        return x / keep * mask


class GRN(nn.Module):
    """Global response normalization (ConvNeXtV2; reference norm.py:31-42)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        gx = jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2, axis=(1, 2), keepdims=True) + 1e-12)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return (gamma * (x * nx.astype(x.dtype)) + beta + x).astype(x.dtype)


class ConvNeXtBlock(nn.Module):
    """dwconv7 -> LN -> pw x4 -> GELU -> (GRN) -> pw -> gamma scale + droppath
    (reference ConvNext2Block, block.py:203-234). v2=True adds GRN and drops
    the layer-scale gamma (ConvNeXtV2)."""

    dim: int
    drop_path: float = 0.0
    layer_scale_init: float = 1e-6
    v2: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        inp = x
        x = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim,
                    dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype)(x)
        x = nn.gelu(x)
        if self.v2:
            x = GRN(4 * self.dim)(x)
        x = nn.Dense(self.dim, dtype=self.dtype)(x)
        if not self.v2 and self.layer_scale_init > 0:
            gamma = self.param("gamma",
                               nn.initializers.constant(self.layer_scale_init),
                               (self.dim,))
            x = x * gamma.astype(x.dtype)
        x = DropPath(self.drop_path)(x, train)
        return inp + x
