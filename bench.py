"""Headline benchmark: SimpleBaseline-R50 256x192 end-to-end inference
(uint8 in -> forward -> on-device DARK decode -> coords) images/sec on one
chip. Prints ONE JSON line.

vs_baseline: the reference repo publishes no numbers (BASELINE.md), so the
comparison point is a nominal reference-stack figure of 1000 img/s for a
PyTorch SimpleBaseline-R50 256x192 fp16 forward+host-decode on one modern
accelerator (consistent with the timm-style per-device numbers shipped in
the reference's vendored CSVs). The driver target is >= 5x.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_IPS = 1000.0
BATCH = 128          # v5e sweet spot for R50 @ 256x192 (measured)
WARMUP = 5
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    from tpupose.models.simple_baseline import SimpleBaseline
    from tpupose.ops.decode import decode_heatmaps
    from tpupose.ops.preprocess import normalize_images

    model = SimpleBaseline(backbone="resnet50", num_keypoints=17,
                           dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    H, W = 256, 192
    imgs = np.random.randint(0, 256, (BATCH, H, W, 3), np.uint8)
    variables = model.init(rng, normalize_images(jnp.asarray(imgs)), train=False)

    @jax.jit
    def step(images):
        x = normalize_images(images)
        hm = model.apply(variables, x, train=False)
        hm = jnp.transpose(hm, (0, 3, 1, 2))
        return decode_heatmaps(hm, method="dark")

    dev_imgs = jax.device_put(jnp.asarray(imgs))
    coords, scores = step(dev_imgs)
    jax.block_until_ready(coords)
    for _ in range(WARMUP):
        coords, scores = step(dev_imgs)
    jax.block_until_ready(coords)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        coords, scores = step(dev_imgs)
    jax.block_until_ready(coords)
    dt = time.perf_counter() - t0

    ips = BATCH * ITERS / dt
    # p50 per-batch latency
    lats = []
    for _ in range(10):
        t = time.perf_counter()
        c, s = step(dev_imgs)
        jax.block_until_ready(c)
        lats.append(time.perf_counter() - t)
    p50_ms = float(np.median(lats) * 1000)

    print(json.dumps({
        "metric": "simple_baseline_r50_256x192_e2e_infer",
        "value": round(ips, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(ips / REFERENCE_IPS, 3),
        "p50_batch_latency_ms": round(p50_ms, 2),
        "batch": BATCH,
    }))


if __name__ == "__main__":
    main()
