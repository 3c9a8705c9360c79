"""Round-4 e2e measurement of the fused Pallas stem+pool serving path.

Stages (all b128, R50 256x192, one v5e chip, median of 3 two-point fits):
  1. isolated: normalize + s2d + stem kernel alone
  2. composed bf16: stem kernel + layer1 kernel + flax tail + DARK decode
     (round-3 bf16 reference: 11,191 img/s)
  3. composed int8: + int8 PTQ intercept tail
     (round-3 int8 champion: 14,288 img/s; 5x target: 16,600)

Run ON TPU from /root/repo: python scripts/r4_stem_e2e.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from tpupose.utils.cache import enable_compile_cache

enable_compile_cache()

from bench import _steady_s  # noqa: E402
from tpupose.models.simple_baseline import SimpleBaseline  # noqa: E402
from tpupose.ops.decode import decode_heatmaps  # noqa: E402
from tpupose.ops.preprocess import normalize_images  # noqa: E402
from tpupose.ops.pallas_stem import (fast_r50_stem_apply,  # noqa: E402
                                     fold_stem_weights, fused_stem_apply,
                                     stem_s2d)

B, H, W = 128, 256, 192


def main():
    print(f"devices={jax.devices()}", flush=True)
    model = SimpleBaseline(backbone="resnet50", num_keypoints=17,
                           dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    imgs = np.random.randint(0, 256, (B, H, W, 3), np.uint8)
    variables = model.init(rng, normalize_images(jnp.asarray(imgs)),
                           train=False)
    dev = jax.device_put(jnp.asarray(imgs))

    # --- stage 1: isolated stem (sweep group x row-chunks) ---------------
    w = fold_stem_weights(variables)
    probe1 = lambda r: np.asarray(r[:1, :1, :1, :1])
    best, best_dt = None, float("inf")
    for g, ch in ((1, 2), (1, 4), (2, 4), (2, 8), (4, 8), (1, 1)):
        try:
            fn = jax.jit(lambda images, g=g, ch=ch: fused_stem_apply(
                normalize_images(images), w, group=g, chunks=ch))
            dt, dt_b = _steady_s(lambda: fn(dev), probe1)
            print(f"STEM_ONLY g={g} ch={ch} ms/b128: {dt*1e3:.3f} "
                  f"(best {dt_b*1e3:.3f})", flush=True)
            if dt < best_dt:
                best, best_dt = (g, ch), dt
        except Exception as e:
            print(f"STEM_ONLY g={g} ch={ch} FAIL: "
                  f"{' '.join(repr(e).split())[:200]}", flush=True)
    print(f"STEM_CONFIG chosen: {best}", flush=True)
    G, CH = best or (1, 2)

    # --- stage 2: composed bf16 e2e (sweep layer1 group) -----------------
    probe = lambda r: np.asarray(r[1])
    L1G, best_dt = None, float("inf")
    step_bf16 = None
    for l1g in (2, 1):
        @jax.jit
        def step(images, l1g=l1g):
            x = normalize_images(images)
            hm = fast_r50_stem_apply(model.apply, variables, None, x,
                                     group=G, chunks=CH, l1_group=l1g,
                                     train=False)
            hm = jnp.transpose(hm, (0, 3, 1, 2))
            return decode_heatmaps(hm, method="dark")

        try:
            dt, dt_b = _steady_s(lambda: step(dev), probe)
            print(f"E2E_BF16_STEM l1g={l1g} img/s: {B/dt:.1f} "
                  f"(best {B/dt_b:.1f}) ms {dt*1e3:.2f}", flush=True)
            if dt < best_dt:
                L1G, best_dt, step_bf16 = l1g, dt, step
        except Exception as e:
            print(f"E2E_BF16_STEM l1g={l1g} FAIL: "
                  f"{' '.join(repr(e).split())[:160]}", flush=True)
    if step_bf16 is None:
        raise SystemExit("no composed bf16 config compiled")

    # --- stage 3: composed int8 e2e --------------------------------------
    from tpupose.ops.quant import calibrate

    scales = calibrate(model.apply, variables, [jnp.asarray(imgs)],
                       preprocess=normalize_images, train=False)

    @jax.jit
    def step_int8(images):
        x = normalize_images(images)
        hm = fast_r50_stem_apply(model.apply, variables, scales, x,
                                 group=G, chunks=CH, l1_group=L1G,
                                 train=False)
        hm = jnp.transpose(hm, (0, 3, 1, 2))
        return decode_heatmaps(hm, method="dark")

    dt, dt_b = _steady_s(lambda: step_int8(dev), probe)
    print(f"E2E_INT8_STEM img/s: {B/dt:.1f} (best {B/dt_b:.1f}) "
          f"ms {dt*1e3:.2f}", flush=True)

    # numeric sanity vs plain forward (device, bf16)
    @jax.jit
    def step_ref(images):
        x = normalize_images(images)
        hm = model.apply(variables, x, train=False)
        hm = jnp.transpose(hm, (0, 3, 1, 2))
        return decode_heatmaps(hm, method="dark")

    ref = step_ref(dev)
    got = step_bf16(dev)
    d = float(jnp.abs(ref[0] - got[0]).max())
    print(f"MAX_COORD_DELTA bf16-stem vs plain: {d:.3f} px", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
