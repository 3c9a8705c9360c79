"""FCMAE — fully-convolutional masked autoencoder pretraining.

Capability parity with the reference FCMAE
(reference: HPE/models/backbones/fcmae.py:6-216: random patch mask
gen_random_mask :103-119, sparse ConvNeXtV2 encoder, mask-token decoder of
one ConvNeXt block, pixel-patch regression loss with optional norm-pix
:148-169, size ctors atto->huge :178-216).

TPU-native re-design (SURVEY.md §2.9): the reference encoder runs on
spconv CUDA sparse tensors; TPUs prefer dense compute, so the encoder is
the dense ConvNeXtV2 with multiplicative patch masks after the stem —
mathematically the same computation the sparse encoder performs on the
visible set (masked activations stay zero through the depthwise/pointwise
stack), with none of the sparse-library machinery. The spconv /
MinkowskiEngine capability surface (SURVEY.md §2.9) is covered by this
masked-dense path.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpupose.models.backbones.convnext import ConvNeXt, get_convnext_arch
from tpupose.models.necks import ConvNeXtBlock


def gen_random_mask(rng, batch: int, num_patches: int, mask_ratio: float = 0.6):
    """Per-image random patch mask: 1 = masked (reference fcmae.py:103-119).
    Returns (B, num_patches) float mask with exactly
    round(mask_ratio * num_patches) ones per row."""
    n_mask = int(round(num_patches * mask_ratio))
    noise = jax.random.uniform(rng, (batch, num_patches))
    order = jnp.argsort(noise, axis=1)
    ranks = jnp.argsort(order, axis=1)
    return (ranks < n_mask).astype(jnp.float32)


def patchify(imgs, patch_size: int):
    """(B, H, W, 3) -> (B, L, patch_size**2 * 3)."""
    B, H, W, C = imgs.shape
    p = patch_size
    x = imgs.reshape(B, H // p, p, W // p, p, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, (H // p) * (W // p), p * p * C)


class FCMAE(nn.Module):
    """Masked-dense ConvNeXtV2 encoder + lightweight decoder + per-patch
    pixel regression."""

    size: str = "atto"
    patch_size: int = 32          # mask granularity = stride-32 feature cells
    mask_ratio: float = 0.6
    decoder_dim: int = 512
    norm_pix: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, imgs, mask=None, train: bool = True, rng=None):
        """imgs: (B, H, W, 3) float in [0, 1] (or uint8 — normalized here).

        Returns (loss, {"pred": (B, L, p*p*3), "mask": (B, L)}).
        """
        if imgs.dtype == jnp.uint8:
            imgs = imgs.astype(jnp.float32) / 255.0
        B, H, W, _ = imgs.shape
        p = self.patch_size
        hp, wp = H // p, W // p
        L = hp * wp
        if mask is None:
            if rng is None:
                rng = self.make_rng("mask")
            mask = gen_random_mask(rng, B, L, self.mask_ratio)   # (B, L)
        mask2d = mask.reshape(B, hp, wp)

        # encoder: dense ConvNeXtV2 with the mask applied at stride 4 and
        # re-applied after every downsample (the sparse-encoder equivalent)
        arch = get_convnext_arch(self.size)
        stem_mask = jax.image.resize(mask2d, (B, H // 4, W // 4),
                                     method="nearest")
        enc = ConvNeXt(depths=arch["depths"], dims=arch["dims"], v2=True,
                       dtype=self.dtype, name="encoder")
        feats = enc(imgs.astype(self.dtype), train=train, mask=stem_mask)
        z = feats[-1]                                            # (B, hp, wp, D)
        # zero masked cells again (downsampling mixes borders slightly)
        z = z * (1.0 - mask2d[..., None].astype(z.dtype))

        # decoder: project, fill masked cells with a learned mask token,
        # one ConvNeXt block, predict pixels (reference fcmae.py decoder)
        zd = nn.Conv(self.decoder_dim, (1, 1), dtype=self.dtype,
                     name="decoder_embed")(z)
        mask_token = self.param("mask_token",
                                nn.initializers.truncated_normal(0.02),
                                (1, 1, 1, self.decoder_dim))
        m = mask2d[..., None].astype(zd.dtype)
        zd = zd * (1 - m) + mask_token.astype(zd.dtype) * m
        zd = ConvNeXtBlock(self.decoder_dim, v2=False, dtype=self.dtype,
                           name="decoder_block")(zd, train)
        pred = nn.Conv(p * p * 3, (1, 1), dtype=jnp.float32,
                       name="pred")(zd)                          # (B,hp,wp,p*p*3)
        pred = pred.reshape(B, L, p * p * 3)

        target = patchify(imgs.astype(jnp.float32), p)
        if self.norm_pix:
            mu = target.mean(-1, keepdims=True)
            var = target.var(-1, keepdims=True)
            target = (target - mu) / jnp.sqrt(var + 1e-6)
        loss = ((pred - target) ** 2).mean(-1)                   # (B, L)
        loss = (loss * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        return loss, {"pred": pred, "mask": mask}
