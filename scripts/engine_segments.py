"""Where do the int8 engine's milliseconds go? Time graph PREFIXES.

The engine's graph IR makes ablation trivial: jit `_forward_int8` over
nodes[:k] for a ladder of cut points (stem, each ResNet stage, each
deconv, final conv, +decode) and report the incremental cost of each
segment. This localizes the measured wall (round 2: engine 13.9k img/s
vs intercept 14.3k despite 34.4 vs 46.4 MB/img — something eats the
bandwidth win) without needing profiler-trace parsing through the
tunnel.

Usage: python scripts/engine_segments.py [batch]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import numpy as np

from bench import _steady_s  # noqa: E402
from tpupose.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


def main(batch=128):
    import jax
    import jax.numpy as jnp

    from tpupose.models.simple_baseline import SimpleBaseline
    from tpupose.ops.int8_engine import Int8Engine, _forward_int8
    from tpupose.ops.preprocess import normalize_images

    H, W = 256, 192
    model = SimpleBaseline(backbone="resnet50", num_keypoints=17,
                           dtype=jnp.bfloat16)
    imgs = np.random.randint(0, 256, (batch, H, W, 3), np.uint8)
    variables = model.init(jax.random.PRNGKey(0),
                           normalize_images(jnp.asarray(imgs)), train=False)
    eng = Int8Engine.build(variables, backbone="resnet50", calib=[imgs])
    nodes = eng._nodes

    adds = [i for i, nd in enumerate(nodes) if nd.kind == "add"]
    deconvs = [i for i, nd in enumerate(nodes)
               if nd.kind == "conv" and nd.spec.deconv]
    pool = next(i for i, nd in enumerate(nodes) if nd.kind == "maxpool")
    cuts = [("stem+pool", pool), ("layer1", adds[2]), ("layer2", adds[6]),
            ("layer3", adds[12]), ("layer4", adds[15])]
    cuts += [(f"deconv{j + 1}", i) for j, i in enumerate(deconvs)]
    cuts += [("final", len(nodes) - 1)]

    dev = jax.device_put(jnp.asarray(imgs))
    qw = eng._qw
    prev = 0.0
    out = {}
    for name, k in cuts:
        sub = nodes[: k + 1]
        f = jax.jit(lambda w, x, sub=sub: _forward_int8(
            sub, w, eng._scales, eng._pad, eng._in_pad, x))
        dt, _ = _steady_s(lambda: f(qw, dev),
                          lambda r: np.asarray(r[:1, :1, :1]), n1=2, n2=8)
        ms = dt * 1e3
        out[name] = round(ms - prev, 3)
        print(f"{name:10s} cum {ms:8.3f} ms  seg {ms - prev:8.3f} ms",
              flush=True)
        prev = ms

    dt, _ = _steady_s(lambda: eng.decode(dev),
                      lambda r: np.asarray(r[1]), n1=2, n2=8)
    out["decode"] = round(dt * 1e3 - prev, 3)
    print(f"{'e2e':10s} cum {dt * 1e3:8.3f} ms  seg {dt * 1e3 - prev:8.3f} ms")
    out["e2e_img_per_s"] = round(batch / dt, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
