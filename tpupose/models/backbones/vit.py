"""DINOv3-style Vision Transformer: 2D RoPE, storage (register) tokens,
per-block intermediate outputs.

Capability parity with the reference's DINOv3 ViT shims
(reference: HPE/models/backbones/dinov3vit.py:1-172 — hub-loaded ViT
subclass returning per-block token maps; size tables :143-172;
pose/pose/model/backbone/dinov3vit.py + MODEL_TO_NUM_LAYERS registries,
pose/pose/model/utils.py:33-134). The reference steals the architecture
from torch.hub; here it is implemented natively (SURVEY.md §2.9: Flax ViT
w/ 2D RoPE + storage tokens + a weight-converter seam).

TPU design: attention uses ops/attention.fused_attention (Pallas flash
kernel on TPU, 2.5x the materializing SDPA at pose sequence lengths;
<= (640/16)^2 = 1600 tokens fits VMEM trivially, SURVEY.md §5.7); bf16
compute; static token counts (CLS + storage + patch).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpupose.models.remat import remat_call

VIT_SIZES = {
    "small": {"depth": 12, "dim": 384, "heads": 6},
    "small_plus": {"depth": 12, "dim": 384, "heads": 6},
    "base": {"depth": 12, "dim": 768, "heads": 12},
    "large": {"depth": 24, "dim": 1024, "heads": 16},
    "huge_plus": {"depth": 32, "dim": 1280, "heads": 20},
    "7b": {"depth": 40, "dim": 4096, "heads": 32},
}


def rope_2d_sincos(h: int, w: int, dim: int, base: float = 100.0,
                   dtype=jnp.float32):
    """Axial 2D RoPE tables for a (h, w) patch grid.

    Returns (sin, cos) of shape (h*w, dim//2): the first dim//4 frequencies
    encode y, the next dim//4 encode x (DINOv3's axial convention).
    Coordinates are normalized to [-1, 1].
    """
    assert dim % 4 == 0, "head_dim must be divisible by 4 for 2D RoPE"
    quarter = dim // 4
    freqs = 1.0 / (base ** (jnp.arange(quarter, dtype=jnp.float32) / quarter))
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ay = gy.reshape(-1, 1) * freqs[None, :]  # (hw, quarter)
    ax = gx.reshape(-1, 1) * freqs[None, :]
    ang = jnp.concatenate([ay, ax], axis=-1)  # (hw, dim//2)
    return jnp.sin(ang).astype(dtype), jnp.cos(ang).astype(dtype)


def apply_rope(q, sin, cos):
    """Rotate patch-token halves. q: (B, T, heads, head_dim) with
    T == sin.shape[0]; sin/cos: (T, head_dim // 2)."""
    d2 = q.shape[-1] // 2
    q1, q2 = q[..., :d2], q[..., d2:]
    sin = sin[:, None, :].astype(q.dtype)   # (T, 1, d2) over (B, T, h, d2)
    cos = cos[:, None, :].astype(q.dtype)
    return jnp.concatenate([q1 * cos - q2 * sin, q2 * cos + q1 * sin], axis=-1)


class RopeAttention(nn.Module):
    """MHSA with 2D RoPE applied to the patch tokens only (CLS/storage
    tokens are position-free, matching DINOv3)."""

    dim: int
    heads: int
    num_prefix: int  # CLS + storage tokens
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, sin, cos):
        B, T, _ = x.shape
        hd = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(B, T, self.heads, hd)

        q, k, v = map(split_heads, (q, k, v))
        p = self.num_prefix
        # rope on patch tokens only
        q = jnp.concatenate([q[:, :p], apply_rope(q[:, p:], sin, cos)], axis=1)
        k = jnp.concatenate([k[:, :p], apply_rope(k[:, p:], sin, cos)], axis=1)
        # Pallas flash kernel on TPU (2.5x the materializing XLA SDPA at
        # 640^2 pose sequence lengths — ops/attention.py), SDPA elsewhere
        from tpupose.ops.attention import fused_attention

        out = fused_attention(q, k, v)
        out = out.reshape(B, T, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    dim: int
    heads: int
    num_prefix: int
    mlp_ratio: float = 4.0
    layer_scale_init: float = 1e-5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, sin, cos):
        def ls(name):
            return self.param(name, nn.initializers.constant(self.layer_scale_init),
                              (self.dim,))

        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        h = RopeAttention(self.dim, self.heads, self.num_prefix,
                          dtype=self.dtype)(h, sin, cos)
        x = x + h * ls("ls1").astype(h.dtype)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        x = x + h * ls("ls2").astype(h.dtype)
        return x


class DinoViT(nn.Module):
    """DINOv3-architecture ViT feature extractor.

    __call__ returns a dict with cls token, storage tokens, patch tokens,
    and (when `intermediates` is set) per-block reshaped feature maps —
    the Dinov3ViT per-block token-dict behavior (dinov3vit.py:86-127) and
    the pose-tree get_intermediate_layers(reshape=True, norm=True)
    accessor (pose/pose/model/backbone/dinov3vit.py).
    """

    depth: int = 12
    dim: int = 384
    heads: int = 6
    patch_size: int = 16
    num_storage_tokens: int = 4
    intermediates: Sequence[int] = ()
    dtype: Any = jnp.bfloat16
    remat: bool = False  # checkpoint each transformer block (models/remat.py)

    @classmethod
    def from_size(cls, size: str, intermediates=(), dtype=jnp.bfloat16, **kw):
        if size not in VIT_SIZES:
            raise ValueError(f"unknown vit size {size!r}; have {sorted(VIT_SIZES)}")
        s = VIT_SIZES[size]
        return cls(depth=s["depth"], dim=s["dim"], heads=s["heads"],
                   intermediates=tuple(intermediates), dtype=dtype, **kw)

    @nn.compact
    def __call__(self, x, train: bool = True):
        B, H, W, _ = x.shape
        ph, pw = H // self.patch_size, W // self.patch_size
        x = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    (self.patch_size, self.patch_size), dtype=self.dtype,
                    name="patch_embed")(x)
        x = x.reshape(B, ph * pw, self.dim)
        cls_tok = self.param("cls_token", nn.initializers.truncated_normal(0.02),
                             (1, 1, self.dim))
        sto = self.param("storage_tokens", nn.initializers.truncated_normal(0.02),
                         (1, self.num_storage_tokens, self.dim))
        prefix = jnp.concatenate([
            jnp.broadcast_to(cls_tok, (B, 1, self.dim)),
            jnp.broadcast_to(sto, (B, self.num_storage_tokens, self.dim)),
        ], axis=1).astype(self.dtype)
        x = jnp.concatenate([prefix, x], axis=1)

        hd = self.dim // self.heads
        sin, cos = rope_2d_sincos(ph, pw, hd)
        p = 1 + self.num_storage_tokens

        inter = {}
        for i in range(self.depth):
            blk = ViTBlock(self.dim, self.heads, p, dtype=self.dtype)
            if self.remat:
                x = remat_call(blk, x, sin, cos)  # all-array args: no statics
            else:
                x = blk(x, sin, cos)
            if i in self.intermediates:
                inter[i] = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)

        def to_map(tokens):
            return tokens[:, p:].reshape(B, ph, pw, self.dim)

        out = {
            "cls": x[:, 0],
            "storage": x[:, 1:p],
            "patches": x[:, p:],
            "feature_map": x[:, p:].reshape(B, ph, pw, self.dim),
        }
        if inter:
            out["intermediates"] = {i: to_map(v) for i, v in inter.items()}
        return out
