"""Roofline/utilization report for the graded configs.

Asks XLA for its own FLOP count of each compiled program
(`compiled.cost_analysis()`), divides by the measured throughput from
`python bench.py`, and reports MXU utilization against the chip's bf16
peak. This is the honest way to count: hand-derived GMACs for a
transposed conv differ 4x depending on whether the zero-stuffed taps are
counted, but cost_analysis reports what the compiled program executes.

Usage: python scripts/roofline.py [bench_json]
  bench_json: the one-line JSON printed by bench.py (default: run with
  FLOP counting only, no utilization column).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16_TFLOPS = 197.0  # TPU v5e per-chip peak


def _ca(compiled):
    ca = compiled.cost_analysis()
    return ca[0] if isinstance(ca, list) else ca


def flops_per_image():
    import jax
    import jax.numpy as jnp
    import optax

    from tpupose.engine.evaluator import TopDownEvaluator
    from tpupose.engine.train_state import (create_train_state,
                                            make_heatmap_train_step)
    from tpupose.losses.heatmap import joints_mse_loss
    from tpupose.models.backbones.hrnet import HRNetPose
    from tpupose.models.simple_baseline import SimpleBaseline
    from tpupose.ops.decode import decode_heatmaps
    from tpupose.ops.preprocess import normalize_images

    out = {}
    H, W = 256, 192
    model = SimpleBaseline(backbone="resnet50", num_keypoints=17,
                           dtype=jnp.bfloat16)
    B = 128
    imgs = jnp.zeros((B, H, W, 3), jnp.uint8)
    variables = model.init(jax.random.PRNGKey(0),
                           normalize_images(imgs[:1]), train=False)

    def step(images):
        x = normalize_images(images)
        hm = model.apply(variables, x, train=False)
        return decode_heatmaps(jnp.transpose(hm, (0, 3, 1, 2)), method="dark")

    c = jax.jit(step).lower(imgs).compile()
    out["r50_infer"] = (_ca(c)["flops"] / B, B)

    B2 = 256
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adamw(1e-3))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, H, W, 3)), tx)
    tstep = make_heatmap_train_step(joints_mse_loss,
                                    color_jitter_strength=0.2,
                                    heatmap_size=(64, 48))
    batch = {"images": jnp.zeros((B2, H, W, 3), jnp.uint8),
             "joints": jnp.full((B2, 17, 2), 10.0),
             "visibility": jnp.ones((B2, 17))}
    c2 = tstep.lower(state, batch).compile()
    out["r50_train"] = (_ca(c2)["flops"] / B2, B2)

    B3, H3, W3 = 128, 384, 288
    m3 = HRNetPose(variant="hrnet_w48", num_keypoints=17, dtype=jnp.bfloat16)
    s3 = create_train_state(m3, jax.random.PRNGKey(0),
                            jnp.zeros((1, H3, W3, 3)), optax.sgd(0.0))
    ev = TopDownEvaluator(s3, (96, 72), decode="dark", flip_test=True)
    c3 = jax.jit(ev._eval_step).lower(
        s3, jnp.zeros((B3, H3, W3, 3), jnp.uint8),
        jnp.zeros((B3, 2)), jnp.ones((B3, 2))).compile()
    out["w48_eval"] = (_ca(c3)["flops"] / B3, B3)
    return out


def main():
    rates = {}
    if len(sys.argv) > 1:
        with open(sys.argv[1]) as f:
            b = json.load(f)
        ex = b.get("extra", b)
        rates = {
            "r50_infer": ex.get("r50_infer", {}).get("img_per_s"),
            "r50_train": ex.get("r50_train", {}).get("train_img_per_s"),
            "w48_eval": ex.get("hrnet_w48_eval", {}).get("eval_img_per_s"),
        }
    fl = flops_per_image()
    rows = []
    for name, (fpi, batch) in fl.items():
        row = {"config": name, "batch": batch,
               "gflops_per_img": round(fpi / 1e9, 2)}
        r = rates.get(name)
        if r:
            row["img_per_s"] = r
            row["tflops_per_s"] = round(fpi * r / 1e12, 1)
            row["mxu_util_pct"] = round(100 * fpi * r / 1e12
                                        / PEAK_BF16_TFLOPS, 1)
        rows.append(row)
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
