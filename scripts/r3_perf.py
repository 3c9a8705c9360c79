"""Round-3 perf experiments on the real chip: does the defer-requant
engine pass (ops/int8_engine._defer_requant) move the VPU-bound wall?

Measures, in order (cheapest evidence first):
  1. int8 ENGINE e2e, b128 and b256  (round-2 recorded 13.9k @ b128)
  2. int8 intercept e2e, b128        (round-2 recorded ~14.1-14.45k)
  3. bf16 e2e, b128                  (round-2 recorded ~11.4k)
plus XLA cost_analysis bytes/flops for the engine program (round-2:
34.4 MB/img) so the traffic delta is on record.

Usage: python scripts/r3_perf.py
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
    from tpupose.ops.decode import decode_heatmaps
    from tpupose.ops.int8_engine import Int8Engine
    from tpupose.ops.preprocess import normalize_images
    from tpupose.ops.quant import calibrate, quantized_apply

    H, W = 256, 192
    model = SimpleBaseline(backbone="resnet50", num_keypoints=17,
                           dtype=jnp.bfloat16)
    imgs128 = np.random.randint(0, 256, (128, H, W, 3), np.uint8)
    variables = model.init(jax.random.PRNGKey(0),
                           normalize_images(jnp.asarray(imgs128)),
                           train=False)
    probe = lambda r: np.asarray(r[1])
    out = {}

    eng = Int8Engine.build(variables, backbone="resnet50", calib=[imgs128])
    for batch in (128, 256):
        imgs = np.random.randint(0, 256, (batch, H, W, 3), np.uint8)
        dev = jax.device_put(jnp.asarray(imgs))
        dt, dt_best = _steady_s(lambda: eng.decode(dev), probe)
        out[f"engine_b{batch}"] = round(batch / dt, 1)
        out[f"engine_b{batch}_best"] = round(batch / dt_best, 1)
        print(json.dumps(out), flush=True)

    dev = jax.device_put(jnp.asarray(imgs128))
    c = eng._dec.lower(eng._qw, dev).compile().cost_analysis()
    c = c[0] if isinstance(c, (list, tuple)) else c
    out["engine_bytes_mb_per_img"] = round(
        c.get("bytes accessed", 0.0) / 128 / 1e6, 2)
    out["engine_gflops_per_img"] = round(c.get("flops", 0.0) / 128 / 1e9, 3)
    print(json.dumps(out), flush=True)

    scales = calibrate(model.apply, variables, [jnp.asarray(imgs128)],
                       preprocess=normalize_images, train=False)

    @jax.jit
    def step_q(images):
        x = normalize_images(images)
        hm = quantized_apply(model.apply, variables, scales, x, train=False)
        return decode_heatmaps(jnp.transpose(hm, (0, 3, 1, 2)), method="dark")

    dt, dt_best = _steady_s(lambda: step_q(dev), probe)
    out["intercept_b128"] = round(128 / dt, 1)
    out["intercept_b128_best"] = round(128 / dt_best, 1)
    print(json.dumps(out), flush=True)

    @jax.jit
    def step(images):
        x = normalize_images(images)
        hm = model.apply(variables, x, train=False)
        return decode_heatmaps(jnp.transpose(hm, (0, 3, 1, 2)), method="dark")

    dt, dt_best = _steady_s(lambda: step(dev), probe)
    out["bf16_b128"] = round(128 / dt, 1)
    out["bf16_b128_best"] = round(128 / dt_best, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
