"""On-TPU validation + timing of the ALL-Pallas int8 serving engine
(ops/pallas_engine.py) — the round-4 route to the 5x target.

Stages:
  1. compile + numerics: engine heatmaps vs the f32 folded-graph
     forward (ops/int8_engine._forward_calib) on a small batch —
     catches Mosaic MISCOMPILES (interpret-mode tests can't).
  2. per-link timing at b128 (stem / stages / head)
  3. e2e median img/s vs the all-XLA int8 champion protocol

Run ON TPU: python scripts/r4_engine_tpu.py [batch]
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpupose.utils.cache import enable_compile_cache

enable_compile_cache()


from tpupose.utils.timing import median_time  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    print("backend:", jax.default_backend(), flush=True)

    from tpupose.models.simple_baseline import SimpleBaseline
    from tpupose.ops.pallas_engine import PallasServingEngine
    from tpupose.ops.int8_engine import _forward_calib, fold_simple_baseline

    model = SimpleBaseline(backbone="resnet50", num_keypoints=17,
                           dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 256, 192, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)

    rs = np.random.RandomState(0)
    calib = rs.randint(0, 256, (8, 256, 192, 3)).astype(np.uint8)
    t0 = time.time()
    eng = PallasServingEngine.build(variables, calib=calib)
    print(f"build: {time.time() - t0:.1f}s  chunks={len(eng.chunks)} "
          f"groups={eng.chunk_groups}+{eng.dec_groups}", flush=True)

    # --- numerics vs f32 folded forward ------------------------------
    imgs_small = jnp.asarray(calib[:4])
    t0 = time.time()
    fwd = jax.jit(eng.forward)
    try:
        hm = np.asarray(jax.block_until_ready(fwd(imgs_small)),
                        np.float32)
    except Exception as e:  # noqa: BLE001
        print("ENGINE COMPILE/RUN FAIL:", " ".join(repr(e).split())[:600],
              flush=True)
        return
    print(f"compile+run small: {time.time() - t0:.1f}s", flush=True)

    nodes, weights, stem_pad, in_pad = fold_simple_baseline(variables)
    ref = np.asarray(jax.jit(
        lambda im: _forward_calib(nodes, weights, stem_pad, in_pad,
                                  im)[0])(imgs_small), np.float32)
    ref = ref[..., :17]
    denom = max(np.abs(ref).max(), 1e-6)
    err_max = np.abs(hm - ref).max() / denom
    err_mean = np.abs(hm - ref).mean() / denom
    ga = hm.reshape(4, -1, 17).argmax(1)
    ra = ref.reshape(4, -1, 17).argmax(1)
    print(f"numerics: rel_max={err_max:.4f} rel_mean={err_mean:.5f} "
          f"argmax_parity={(ga == ra).mean():.3f}", flush=True)

    # --- per-link + e2e timing at B ----------------------------------
    imgs = jnp.asarray(rs.randint(0, 256, (B, 256, 192, 3), np.uint8))
    t = median_time(fwd, imgs)
    print(f"e2e b{B}: {t * 1e3:.2f} ms  {B / t:,.0f} img/s", flush=True)

    # per-link: time progressively longer prefixes
    from tpupose.ops.pallas_stem import center_raw, stem_s2d, stem_pool_pallas
    from tpupose.ops.pallas_stages import QMAX, run_chunk
    from tpupose.ops.pallas_head import run_deconv

    def prefix(n_chunks, n_dec):
        def f(im):
            x = center_raw(im).astype(jnp.bfloat16)
            x4 = stem_s2d(x)
            fmap = stem_pool_pallas(x4, eng.stem_w, group=eng.stem_group)
            xi8 = jnp.clip(jnp.round(fmap.astype(jnp.float32)
                                     / eng.s_stem), 0.0, QMAX
                           ).astype(jnp.int8)
            for ch, g in zip(eng.chunks[:n_chunks],
                             eng.chunk_groups[:n_chunks]):
                xi8 = run_chunk(xi8, ch, g=g)
            y = xi8
            for d, g in zip(eng.deconvs[:n_dec], eng.dec_groups[:n_dec]):
                y = run_deconv(y, d, g=g)
            return y
        return jax.jit(f)

    marks = [(0, 0, "stem")]
    for i in range(len(eng.chunks)):
        marks.append((i + 1, 0, f"chunk{i}"))
    for j in range(len(eng.deconvs)):
        marks.append((len(eng.chunks), j + 1, f"deconv{j}"))
    prev = 0.0
    for n_ch, n_de, name in marks:
        tt = median_time(prefix(n_ch, n_de), imgs, n1=2, n2=8)
        print(f"  prefix {name:10s}: {tt * 1e3:7.2f} ms  "
              f"(+{(tt - prev) * 1e3:6.2f})", flush=True)
        prev = tt


if __name__ == "__main__":
    main()
