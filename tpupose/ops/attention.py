"""Fused (flash) attention dispatch for the ViT backbone.

XLA's materializing attention is HBM-bound at DINOv3-ViT pose shapes: at
640^2 / patch 16 the token count is 1605 (1600 patches + cls + 4 storage
tokens), so the per-layer score tensor is (B, 6, 1605, 1605) — ~0.5 GB
bf16 at batch 16 written + read twice around the softmax. Measured on
v5e: 3.11 ms/layer (20 TF/s effective), ~76% of the whole DINOv3Pose
ViT-S forward.

The Pallas TPU flash-attention kernel (jax.experimental.pallas.ops) keeps
score blocks in VMEM and streams K/V, but requires the sequence padded to
a multiple of 128 and block sizes dividing it. This wrapper:

- pads L -> Lp (next multiple of 128) and masks the pad via SegmentIds
  (pad tokens get a different segment id, so real queries never attend to
  them; padded-query garbage rows are sliced off),
- picks the largest legal block configuration that fits VMEM — at pose
  sequence lengths the whole (Lp, Lp) fp32 score block fits (11 MB at
  1664), which measured FASTEST: 1.24 ms/layer, 2.5x XLA (block sweep in
  the r2 log; small 128-blocks are 6x SLOWER than full-length here),
- falls back to jax.nn.dot_product_attention off-TPU (CPU tests, GPU)
  and for sequences too long for single-block VMEM residency.

Gradients flow through the kernel's custom VJP (dq/dkv block sizes are
set to the same config), so finetuning the backbone uses it too.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _on_tpu() -> bool:
    # 'axon' is the tunneled-TPU plugin platform name in this container
    return jax.default_backend() in ("tpu", "axon")


# largest Lp for which the single-block config (whole (Lp, Lp) fp32 score
# tile resident in VMEM) is safe: Lp^2 * 4B + 3 * Lp * D * 2B << 16 MB
_MAX_SINGLE_BLOCK = 1792


def _flash(q, k, v, scale: float):
    """q/k/v (B, L, h, D) -> (B, L, h, D) via the Pallas TPU kernel."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    B, L, h, D = q.shape
    Lp = ((L + 127) // 128) * 128
    pad = Lp - L
    bs = BlockSizes(
        block_q=Lp, block_k_major=Lp, block_k=Lp, block_b=1,
        block_q_major_dkv=Lp, block_k_major_dkv=Lp, block_k_dkv=Lp,
        block_q_dkv=Lp, block_k_major_dq=Lp, block_k_dq=Lp, block_q_dq=Lp)

    def to_bhld(x):
        x = jnp.transpose(x, (0, 2, 1, 3))
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return x

    seg = None
    if pad:
        ids = jnp.concatenate([jnp.ones((B, L), jnp.int32),
                               jnp.full((B, pad), 2, jnp.int32)], axis=1)
        seg = SegmentIds(q=ids, kv=ids)
    o = flash_attention(to_bhld(q), to_bhld(k), to_bhld(v),
                        segment_ids=seg, sm_scale=scale, block_sizes=bs)
    return jnp.transpose(o[:, :, :L], (0, 2, 1, 3))


def fused_attention(q, k, v, scale: float | None = None):
    """Drop-in SDPA: q/k/v (B, L, num_heads, head_dim), softmax(qk^T)v.

    Pallas flash kernel on TPU (sequence padded to 128, pad masked exactly
    via segment ids); jax.nn.dot_product_attention elsewhere. Matches XLA
    SDPA to bf16 tolerance (~2e-3 measured)."""
    D = q.shape[-1]
    if scale is None:
        scale = 1.0 / float(np.sqrt(D))
    Lp = ((q.shape[1] + 127) // 128) * 128
    if _on_tpu() and Lp <= _MAX_SINGLE_BLOCK and q.shape[1] > 1:
        return _flash(q, k, v, scale)
    return jax.nn.dot_product_attention(q, k, v, scale=scale)
