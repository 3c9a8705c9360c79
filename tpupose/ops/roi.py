"""ROI mean-pooling of backbone feature maps — on-device appearance
embeddings for tracking.

The reference's video story tracks detections with DINO backbone
features (pose/dino_tracking.ipynb; BASELINE.json config 5
"detector crops -> batched pose -> DINO-feature tracking"). This op
turns the detector's own backbone feature map into per-detection
appearance embeddings WITHOUT leaving the device: an integral image
(2D cumulative sum) over the feature map makes every box's mean a
4-gather O(1) lookup, so pooling `D` boxes costs one tiny cumsum plus
4 gathers — static shapes, no loops, jit/vmap-friendly.

This replaces a host-side crop -> re-embed round trip (what the
notebook does with a second DINO forward per crop) with a free readout
of features the detector already computed.
"""

from __future__ import annotations

import jax.numpy as jnp


def integral_image(fmap):
    """(B, h, w, C) -> summed-area table (B, h+1, w+1, C) in fp32.

    S[b, y, x] = sum of fmap[b, :y, :x]; the zero row/column makes the
    box-sum identity S[y1,x1] - S[y0,x1] - S[y1,x0] + S[y0,x0] valid for
    any 0 <= y0 <= y1 <= h.
    """
    s = jnp.cumsum(jnp.cumsum(fmap.astype(jnp.float32), axis=1), axis=2)
    return jnp.pad(s, ((0, 0), (1, 0), (1, 0), (0, 0)))


def roi_mean_pool(fmap, boxes, image_size, l2_normalize: bool = True):
    """Mean-pool `fmap` over each box.

    fmap:   (B, h, w, C) feature map (any float dtype; pooled in fp32).
    boxes:  (B, D, 4) xyxy in IMAGE pixel coordinates (the NMS output
            convention); the map's stride is inferred from `image_size`.
    image_size: (H, W) of the model input the boxes live in.

    Returns (B, D, C) fp32 embeddings, L2-normalized by default (cosine
    similarity becomes a plain dot product in the tracker). Degenerate or
    padded boxes clamp to at least one cell, so the result is always
    finite — mask with the NMS `valid` flags downstream.
    """
    B, h, w, C = fmap.shape
    H, W = image_size
    sx, sy = w / W, h / H

    x0 = jnp.clip(jnp.floor(boxes[..., 0] * sx), 0, w - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(boxes[..., 1] * sy), 0, h - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil(boxes[..., 2] * sx), x0 + 1, w).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil(boxes[..., 3] * sy), y0 + 1, h).astype(jnp.int32)

    S = integral_image(fmap)                          # (B, h+1, w+1, C)
    bidx = jnp.arange(B)[:, None]                     # (B, 1) broadcast to D
    total = (S[bidx, y1, x1] - S[bidx, y0, x1]
             - S[bidx, y1, x0] + S[bidx, y0, x0])     # (B, D, C)
    area = ((y1 - y0) * (x1 - x0)).astype(jnp.float32)[..., None]
    emb = total / area
    if l2_normalize:
        emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-9)
    return emb
