"""int8 serving batch sweep on the real chip: is 128 still the sweet spot
for the quantized R50 program? (bf16 sweet spots measured separately:
infer b128, train b256 — see BASELINE.md / memory notes.)

Usage: python scripts/int8_sweep.py   (prints one JSON line per batch)
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpupose.utils.cache import enable_compile_cache
    enable_compile_cache()

    from tpupose.models.simple_baseline import SimpleBaseline
    from tpupose.ops.decode import decode_heatmaps
    from tpupose.ops.preprocess import normalize_images
    from tpupose.ops.quant import calibrate, quantized_apply

    model = SimpleBaseline(backbone="resnet50", num_keypoints=17,
                           dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    H, W = 256, 192
    imgs0 = np.random.randint(0, 256, (8, H, W, 3), np.uint8)
    variables = model.init(rng, normalize_images(jnp.asarray(imgs0)),
                           train=False)
    scales = calibrate(model.apply, variables, [jnp.asarray(imgs0)],
                       preprocess=normalize_images, train=False)

    def steady(call, probe, n1=4, n2=16):
        def run(n):
            t0 = time.perf_counter()
            r = None
            for _ in range(n):
                r = call()
            probe(r)
            return time.perf_counter() - t0

        run(2); run(2)
        best = float("inf")
        for _ in range(2):
            t1, t2 = run(n1), run(n2)
            best = min(best, max((t2 - t1) / (n2 - n1), 1e-9))
        return best

    for batch in (64, 128, 256, 512):
        imgs = np.random.randint(0, 256, (batch, H, W, 3), np.uint8)

        @jax.jit
        def step_q(images):
            x = normalize_images(images)
            hm = quantized_apply(model.apply, variables, scales, x,
                                 train=False)
            hm = jnp.transpose(hm, (0, 3, 1, 2))
            return decode_heatmaps(hm, method="dark")

        dev = jax.device_put(jnp.asarray(imgs))
        dt = steady(lambda: step_q(dev), lambda r: np.asarray(r[1]))
        print(json.dumps({"batch": batch,
                          "int8_img_per_s": round(batch / dt, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
