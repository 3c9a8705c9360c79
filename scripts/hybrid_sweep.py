"""Hybrid-precision sweep for the R50 serving path (round 3).

Segment timing (scripts/engine_segments.py) showed the narrow-channel
early layers are catastrophically MXU-inefficient as int8 (layer1 alone
4.35 ms of 11.4 — ~6% MXU), while the intercept path (bf16 activations,
int8 convs) is today's champion at ~14.3k img/s. The intercept mechanism
selects quantized layers BY SCALE DICT, so per-layer precision is a
config, not code: this sweep drops layer groups from the int8 set to
find the fastest mix.

Usage: python scripts/hybrid_sweep.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import numpy as np

from bench import _steady_s  # noqa: E402
from tpupose.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


def block_group(path: str) -> str:
    """R50 flax path -> coarse group: stem, l1..l4, head."""
    if path.startswith("HeatmapHead"):
        return "head"
    if "Bottleneck_" in path:
        i = int(path.split("Bottleneck_")[1].split("/")[0])
        if i <= 2:
            return "l1"
        if i <= 6:
            return "l2"
        if i <= 12:
            return "l3"
        return "l4"
    return "stem"


VARIANTS = {
    "full": (),                              # today's intercept champion
    "no_stem": ("stem",),
    "no_l1": ("stem", "l1"),
    "no_l12": ("stem", "l1", "l2"),
    "only_l34_head": ("stem", "l1", "l2"),   # alias kept for readability
    "no_head": ("head",),
    "l34_only": ("stem", "l1", "l2", "head"),
}


def main():
    import jax
    import jax.numpy as jnp

    from tpupose.models.simple_baseline import SimpleBaseline
    from tpupose.ops.decode import decode_heatmaps
    from tpupose.ops.preprocess import normalize_images
    from tpupose.ops.quant import calibrate, quantized_apply

    H, W = 256, 192
    model = SimpleBaseline(backbone="resnet50", num_keypoints=17,
                           dtype=jnp.bfloat16)
    imgs = np.random.randint(0, 256, (128, H, W, 3), np.uint8)
    variables = model.init(jax.random.PRNGKey(0),
                           normalize_images(jnp.asarray(imgs)), train=False)
    scales = calibrate(model.apply, variables, [jnp.asarray(imgs)],
                       preprocess=normalize_images, train=False)
    dev = jax.device_put(jnp.asarray(imgs))
    probe = lambda r: np.asarray(r[1])
    out = {}

    best = (None, 0.0)
    for name, drop in VARIANTS.items():
        sub = {k: v for k, v in scales.items()
               if block_group(k) not in drop}

        @jax.jit
        def step(images, sub=sub):
            x = normalize_images(images)
            hm = quantized_apply(model.apply, variables, sub, x,
                                 train=False)
            return decode_heatmaps(jnp.transpose(hm, (0, 3, 1, 2)),
                                   method="dark")

        dt, dt_best = _steady_s(lambda: step(dev), probe, n1=2, n2=10)
        out[name] = round(128 / dt, 1)
        out[name + "_best"] = round(128 / dt_best, 1)
        print(json.dumps({name: out[name]}), flush=True)
        if out[name] > best[1]:
            best = (name, out[name])

    # batch sweep on the winner
    drop = VARIANTS[best[0]]
    sub = {k: v for k, v in scales.items() if block_group(k) not in drop}
    for batch in (256,):
        imgs2 = np.random.randint(0, 256, (batch, H, W, 3), np.uint8)
        dev2 = jax.device_put(jnp.asarray(imgs2))

        @jax.jit
        def step2(images):
            x = normalize_images(images)
            hm = quantized_apply(model.apply, variables, sub, x,
                                 train=False)
            return decode_heatmaps(jnp.transpose(hm, (0, 3, 1, 2)),
                                   method="dark")

        dt, dt_best = _steady_s(lambda: step2(dev2), probe, n1=2, n2=10)
        out[f"{best[0]}_b{batch}"] = round(batch / dt, 1)
        out[f"{best[0]}_b{batch}_best"] = round(batch / dt_best, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
