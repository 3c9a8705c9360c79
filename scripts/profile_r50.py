"""Component-level timing of the headline R50 256x192 serving path.

Splits the end-to-end program into pieces and times each on the real
chip so optimization effort goes where the milliseconds are:

  normalize | backbone | +head (full model) | +decode (e2e) | int8 e2e

Run: python scripts/profile_r50.py [batch]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np

from bench import _steady_s  # noqa: E402
from tpupose.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


def main(batch=128):
    import jax
    import jax.numpy as jnp

    from tpupose.models.backbones.resnet import ResNet
    from tpupose.models.simple_baseline import SimpleBaseline
    from tpupose.ops.decode import decode_heatmaps
    from tpupose.ops.preprocess import normalize_images

    H, W = 256, 192
    rng = jax.random.PRNGKey(0)
    imgs = np.random.randint(0, 256, (batch, H, W, 3), np.uint8)
    dev = jax.device_put(jnp.asarray(imgs))

    model = SimpleBaseline(backbone="resnet50", num_keypoints=17,
                           dtype=jnp.bfloat16)
    variables = model.init(rng, normalize_images(dev), train=False)

    bb = ResNet.from_name("resnet50", dtype=jnp.bfloat16)
    bb_vars = {"params": variables["params"]["ResNet_0"],
               "batch_stats": variables["batch_stats"]["ResNet_0"]}

    stages = {}

    @jax.jit
    def f_norm(x):
        return normalize_images(x)

    @jax.jit
    def f_backbone(x):
        return bb.apply(bb_vars, normalize_images(x), train=False)

    @jax.jit
    def f_model(x):
        return model.apply(variables, normalize_images(x), train=False)

    @jax.jit
    def f_e2e(x):
        hm = model.apply(variables, normalize_images(x), train=False)
        return decode_heatmaps(jnp.transpose(hm, (0, 3, 1, 2)), method="dark")

    def time_it(name, fn, probe):
        dt, _ = _steady_s(lambda: fn(dev), probe)
        stages[name] = dt * 1e3
        print(f"{name:12s} {dt*1e3:8.3f} ms/batch  {batch/dt:10.1f} img/s")

    time_it("normalize", f_norm, lambda r: np.asarray(r[:1, :1, :1]))
    time_it("backbone", f_backbone, lambda r: np.asarray(r[:1, :1, :1, :1]))
    time_it("model", f_model, lambda r: np.asarray(r[:1, :1, :1, :1]))
    time_it("e2e", f_e2e, lambda r: np.asarray(r[1]))

    # int8
    from tpupose.ops.quant import calibrate, quantized_apply
    scales = calibrate(model.apply, variables, [dev],
                       preprocess=normalize_images, train=False)

    @jax.jit
    def f_model_q(x):
        return quantized_apply(model.apply, variables, scales,
                               normalize_images(x), train=False)

    @jax.jit
    def f_e2e_q(x):
        hm = quantized_apply(model.apply, variables, scales,
                             normalize_images(x), train=False)
        return decode_heatmaps(jnp.transpose(hm, (0, 3, 1, 2)), method="dark")

    time_it("model_int8", f_model_q, lambda r: np.asarray(r[:1, :1, :1, :1]))
    time_it("e2e_int8", f_e2e_q, lambda r: np.asarray(r[1]))

    # fused int8 engine: int8 activations end-to-end
    from tpupose.ops.int8_engine import Int8Engine
    eng = Int8Engine.build(variables, backbone="resnet50", calib=[imgs])
    f_eng = eng._fwd
    time_it("engine_fwd", lambda x: f_eng(eng._qw, x),
            lambda r: np.asarray(r[:1, :1, :1, :1]))
    time_it("engine_e2e", lambda x: eng.decode(x), lambda r: np.asarray(r[1]))

    print(f"\nhead = model - backbone   = {stages['model']-stages['backbone']:.3f} ms")
    print(f"decode = e2e - model      = {stages['e2e']-stages['model']:.3f} ms")
    print(f"decode(q) = e2eq - modelq = {stages['e2e_int8']-stages['model_int8']:.3f} ms")

    # FLOP accounting from XLA itself
    for name, lowered in (("backbone", f_backbone.lower(dev)),
                          ("model", f_model.lower(dev)),
                          ("e2e", f_e2e.lower(dev)),
                          ("e2e_int8", f_e2e_q.lower(dev)),
                          ("engine_e2e", eng._dec.lower(eng._qw, dev))):
        c = lowered.compile().cost_analysis()
        c = c[0] if isinstance(c, (list, tuple)) else c
        fl = c.get("flops", 0.0)
        by = c.get("bytes accessed", 0.0)
        print(f"{name:10s} flops/img={fl/batch/1e9:7.3f}G  bytes/img="
              f"{by/batch/1e6:8.2f}MB  arith_intensity={fl/max(by,1):6.1f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
