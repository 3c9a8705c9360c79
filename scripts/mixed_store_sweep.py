"""Measure the mixed-store engine (round 3) against the classic all-int8
engine and record bytes/img, on the real chip.

Variants: min_int8_channels in {128 (default), 256, 0 (classic)} at
b128; winner also at b256. Round-3 context: intercept path = 14.2-14.3k
img/s, classic engine = 11.2k (today's tunnel), bf16 = 11.1k.

Usage: python scripts/mixed_store_sweep.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import numpy as np

from bench import _steady_s  # noqa: E402
from tpupose.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


def main():
    import jax
    import jax.numpy as jnp

    from tpupose.models.simple_baseline import SimpleBaseline
    from tpupose.ops.int8_engine import Int8Engine
    from tpupose.ops.preprocess import normalize_images

    H, W = 256, 192
    model = SimpleBaseline(backbone="resnet50", num_keypoints=17,
                           dtype=jnp.bfloat16)
    imgs = np.random.randint(0, 256, (128, H, W, 3), np.uint8)
    variables = model.init(jax.random.PRNGKey(0),
                           normalize_images(jnp.asarray(imgs)), train=False)
    dev = jax.device_put(jnp.asarray(imgs))
    probe = lambda r: np.asarray(r[1])
    out = {}

    best = (None, 0.0, None)
    for min_ch in (128, 256, 0):
        eng = Int8Engine.build(variables, backbone="resnet50",
                               calib=[imgs], min_int8_channels=min_ch)
        dt, dt_best = _steady_s(lambda: eng.decode(dev), probe, n1=2, n2=10)
        name = f"min{min_ch}"
        out[name] = round(128 / dt, 1)
        out[name + "_best"] = round(128 / dt_best, 1)
        c = eng._dec.lower(eng._qw, dev).compile().cost_analysis()
        c = c[0] if isinstance(c, (list, tuple)) else c
        out[name + "_mb_img"] = round(c.get("bytes accessed", 0.0) / 128 / 1e6, 2)
        print(json.dumps(out), flush=True)
        if out[name] > best[1]:
            best = (name, out[name], eng)

    eng = best[2]
    imgs2 = np.random.randint(0, 256, (256, H, W, 3), np.uint8)
    dev2 = jax.device_put(jnp.asarray(imgs2))
    dt, dt_best = _steady_s(lambda: eng.decode(dev2), probe, n1=2, n2=10)
    out[best[0] + "_b256"] = round(256 / dt, 1)
    out[best[0] + "_b256_best"] = round(256 / dt_best, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
