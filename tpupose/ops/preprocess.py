"""Device-side image preprocessing.

The reference ships uint8 to the device and divides by 255 there
(pose/pose/engine/trainer.py:54-56) — the right instinct for TPU too:
uint8 host->HBM transfer is 4x cheaper than float32. normalize_images is
the fused uint8 -> bf16 normalize step; XLA fuses it into the first conv.
"""

from __future__ import annotations

import jax.numpy as jnp

# ImageNet statistics (timm/DINOv3 backbones expect these)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_images(images, mean=IMAGENET_MEAN, std=IMAGENET_STD,
                     dtype=jnp.bfloat16, scale_only: bool = False):
    """uint8/float (B, H, W, C) -> normalized `dtype` NHWC.

    scale_only=True reproduces the reference's plain /255 path
    (pose trainer); otherwise ImageNet mean/std are applied.
    """
    x = images.astype(jnp.float32) * (1.0 / 255.0)
    if not scale_only:
        m = jnp.asarray(mean, dtype=jnp.float32)
        s = jnp.asarray(std, dtype=jnp.float32)
        x = (x - m) / s
    return x.astype(dtype)


def color_jitter(images, rng, strength: float = 0.2):
    """Cheap on-device color jitter: random brightness/contrast/saturation
    scalars per image. images: float (B, H, W, C) in [0, 1]-ish space.
    """
    import jax

    b, c, s = jax.random.split(rng, 3)
    B = images.shape[0]
    bf = 1.0 + jax.random.uniform(b, (B, 1, 1, 1), minval=-strength, maxval=strength)
    cf = 1.0 + jax.random.uniform(c, (B, 1, 1, 1), minval=-strength, maxval=strength)
    sf = 1.0 + jax.random.uniform(s, (B, 1, 1, 1), minval=-strength, maxval=strength)
    x = images * bf
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    x = (x - mean) * cf + mean
    gray = jnp.mean(x, axis=-1, keepdims=True)
    x = (x - gray) * sf + gray
    return jnp.clip(x, 0.0, 1.0)
