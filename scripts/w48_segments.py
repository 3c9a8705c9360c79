"""HRNet-W48 384x288 per-stage timing + MFU (VERDICT.md r3 task 5: the
R50 treatment for graded config 4).

Times int8-engine graph PREFIXES at the stage boundaries (stem,
bottleneck stage1, each HR stage, final head), derives per-segment MFU
from XLA's cost_analysis FLOPs, and compares the three serving paths
(bf16 eval step / int8 intercept / int8 engine) to localize why the
engine trails the intercept on this model (BENCH_r03: 774 vs 802 img/s).

Usage (on TPU): python scripts/w48_segments.py [batch]
"""
from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from tpupose.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

from bench import _steady_s  # noqa: E402

V5E_PEAK_BF16 = 197e12
V5E_PEAK_INT8 = 394e12


def main(batch=128):
    import jax
    import jax.numpy as jnp

    from tpupose.models.backbones.hrnet import HRNetPose
    from tpupose.ops.int8_engine import Int8Engine, _forward_int8
    from tpupose.ops.preprocess import normalize_images

    H, W = 384, 288
    model = HRNetPose(variant="hrnet_w48", num_keypoints=17,
                      dtype=jnp.bfloat16)
    imgs = np.random.randint(0, 256, (batch, H, W, 3), np.uint8)
    variables = model.init(jax.random.PRNGKey(0),
                           normalize_images(jnp.asarray(imgs[:2])),
                           train=False)
    eng = Int8Engine.build(variables, backbone="hrnet_w48",
                           calib=[imgs[:32]])
    nodes = eng._nodes

    def last_conv_named(pred):
        idx = [i for i, nd in enumerate(nodes)
               if nd.kind == "conv" and pred(nd.spec.name)]
        return max(idx)

    cuts = [
        ("stem", last_conv_named(lambda n: n == "stem1")),
        ("layer1(bneck)", last_conv_named(lambda n: n.startswith(
            "Bottleneck_3"))),
        ("stage2", last_conv_named(lambda n: n.startswith("s0"))),
        ("stage3", last_conv_named(lambda n: n.startswith("s1"))),
        ("stage4", last_conv_named(lambda n: n.startswith("s2"))),
        ("head", len(nodes) - 1),
    ]
    # extend each cut through trailing non-conv nodes (adds/upsamples)
    # so segments end at a fuse boundary
    ext = []
    for name, k in cuts:
        while k + 1 < len(nodes) and nodes[k + 1].kind != "conv":
            k += 1
        ext.append((name, k))
    cuts = ext

    dev = jax.device_put(jnp.asarray(imgs))
    qw = eng._qw
    prev_ms, prev_fl = 0.0, 0.0
    out = {"batch": batch}
    for name, k in cuts:
        sub = nodes[: k + 1]
        f = jax.jit(lambda w, x, sub=sub: _forward_int8(
            sub, w, eng._scales, eng._pad, eng._in_pad, x))
        lowered = f.lower(qw, dev).compile()
        fl = lowered.cost_analysis()
        flops = float(fl.get("flops", 0.0)) if fl else 0.0
        dt, _ = _steady_s(lambda: f(qw, dev),
                          lambda r: np.asarray(r[:1, :1, :1]), n1=2, n2=8)
        ms = dt * 1e3
        seg_ms = ms - prev_ms
        seg_fl = flops - prev_fl
        mfu = seg_fl / max(seg_ms * 1e-3, 1e-9) / V5E_PEAK_INT8
        out[name] = {"seg_ms": round(seg_ms, 3),
                     "seg_gflops": round(seg_fl / 1e9, 2),
                     "mfu_vs_int8_peak": round(mfu, 3)}
        print(f"{name:14s} cum {ms:8.3f} ms  seg {seg_ms:7.3f} ms  "
              f"MFU(int8) {mfu:5.1%}", flush=True)
        prev_ms, prev_fl = ms, flops

    dt, _ = _steady_s(lambda: eng.decode(dev),
                      lambda r: np.asarray(r[1]), n1=2, n2=8)
    out["decode_seg_ms"] = round(dt * 1e3 - prev_ms, 3)
    out["engine_img_per_s"] = round(batch / dt, 1)
    print(f"{'e2e+decode':14s} cum {dt*1e3:8.3f} ms "
          f"-> {batch/dt:.1f} img/s", flush=True)

    # node-kind census of where engine time could leak vs the intercept:
    # requant epilogues on tiny branch convs + nearest upsamples
    census = {}
    for nd in nodes:
        census[nd.kind] = census.get(nd.kind, 0) + 1
    out["node_census"] = census
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
