"""Trained-weights metric parity gate for the ALL-Pallas int8 engine
(VERDICT.md r4 task 3): the same bar as tests/test_int8_metric_parity.py
— PCK delta < 0.5 pt and mean coord delta < 0.5 heatmap px vs bf16 —
but on the engine's actual shape (R50 256x192, which the CPU test tier
cannot train in reasonable time) and through the REAL Mosaic kernels
(stricter than the interpret-mode oracle tests).

Recipe: overfit SimpleBaseline-R50 on synthetic blob crops at the
graded 256x192 shape until it truly localizes (the test_train_smoke.py
recipe on TPU), then decode through (a) bf16 apply, (b) int8 PTQ
intercept, (c) the fused int8 XLA engine, (d) the all-Pallas int8
engine, and compare PCK@0.2 and raw DARK coordinates.

Run ON TPU: PYTHONPATH=/root/repo python scripts/r5_engine_parity_tpu.py
The committed output lives at docs/R5_ENGINE_PARITY.log.
"""
from __future__ import annotations

import time

import numpy as np

from tpupose.utils.cache import enable_compile_cache

enable_compile_cache()


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from tpupose.data.synthetic import SyntheticTopDownDataset
    from tpupose.engine.train_state import (create_train_state,
                                            make_heatmap_train_step)
    from tpupose.losses.heatmap import joints_mse_loss
    from tpupose.models.simple_baseline import SimpleBaseline
    from tpupose.ops.decode import decode_heatmaps
    from tpupose.ops.int8_engine import Int8Engine
    from tpupose.ops.pallas_engine import PallasServingEngine
    from tpupose.ops.preprocess import normalize_images
    from tpupose.ops.quant import calibrate, quantized_apply

    print("backend:", jax.default_backend(), flush=True)
    H, W, K = 256, 192, 3   # K=3: per-channel-unambiguous blobs (the
    # test_train_smoke recipe) — K=17 shares 3 color channels and cannot
    # latch; the engine build is K-generic (final conv lanes pad to 32)
    HH, HW = 64, 48

    ds = SyntheticTopDownDataset(16, (H, W), (HH, HW), K, seed=0)
    samples = [ds[i] for i in range(16)]
    imgs = np.stack([s["image"] for s in samples])
    joints = np.stack([s["joints"] for s in samples])
    vis = np.stack([s["visibility"] for s in samples])

    model = SimpleBaseline(backbone="resnet50", num_keypoints=K,
                           dtype=jnp.float32)
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(3e-3))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, H, W, 3)), tx)
    step = make_heatmap_train_step(joints_mse_loss,
                                   heatmap_size=(HH, HW))
    batch = {"images": jnp.asarray(imgs),
             "joints": jnp.asarray(joints),
             "visibility": jnp.asarray(vis)}

    # --- AP-convergence protocol at the graded shape (VERDICT r4 task
    # 8): early AP ~ 0 (predict-zero plateau), late AP > 0.5, earned
    # through the production DARK decode + OKSAP chain — the graded-
    # config twin of tests/test_e2e_ap_convergence.py (R18-64^2).
    from tpupose.metrics.oks_ap import OKSAP

    def oks_ap():
        hm_ = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            normalize_images(jnp.asarray(imgs), dtype=jnp.float32),
            train=False)
        c_, s_ = decode_heatmaps(jnp.transpose(hm_, (0, 3, 1, 2)),
                                 method="dark")
        c_ = np.asarray(c_) * 4.0
        s_ = np.asarray(s_)
        ap = OKSAP(num_classes=1)
        for i in range(len(imgs)):
            ap.update(c_[i:i + 1],
                      np.asarray([float(s_[i].mean())]),
                      joints[i:i + 1] * 4.0, vis[i:i + 1],
                      np.asarray([float(H * W) * 0.53]),
                      gt_valid=np.asarray([True]))
        return float(ap.compute()["mAP"])

    t0 = time.time()
    for i in range(30):
        state, metrics = step(state, batch)
    ap_early = oks_ap()
    # MSE-on-sparse-Gaussians sits at the predict-zero plateau
    # (loss ~0.002 here) for the first several hundred steps;
    # localization at this scale needs ~700+ (tests/README.md) — train
    # past it, reporting progress
    ap_late, total = ap_early, 30
    for chunk in (370, 400, 400, 400, 400):
        for i in range(chunk):
            state, metrics = step(state, batch)
        total += chunk
        ap_late = oks_ap()
        loss = float(metrics["loss"])
        print(f"  step {total}: loss={loss:.5f} AP={ap_late:.4f}",
              flush=True)
        if ap_late > 0.9:
            break
    print(f"train: {total} steps in {time.time() - t0:.0f}s  "
          f"AP(step30)={ap_early:.4f} AP(end)={ap_late:.4f}", flush=True)
    assert ap_late > 0.5 and ap_late > ap_early + 0.2, (ap_early, ap_late)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    x = normalize_images(jnp.asarray(imgs), dtype=jnp.float32)

    def decode(hm):
        c, _ = decode_heatmaps(jnp.transpose(hm, (0, 3, 1, 2)),
                               method="dark")
        return np.asarray(c)

    def pck(coords, thresh_px=0.2 * HH):
        err = np.linalg.norm(np.asarray(coords) - joints, axis=-1)
        err = err[vis > 0]
        return (err < thresh_px).mean(), err.mean()

    hm = state.apply_fn(variables, x, train=False)
    c_bf16 = decode(hm)
    pck_bf16, err_bf16 = pck(c_bf16)
    print(f"(a) bf16:          PCK@0.2={pck_bf16:.4f} "
          f"mean_err={err_bf16:.3f}px", flush=True)
    assert pck_bf16 > 0.9, pck_bf16

    scales = calibrate(state.apply_fn, variables, [jnp.asarray(imgs)],
                       preprocess=lambda im: normalize_images(
                           im, dtype=jnp.float32), train=False)
    c_q = decode(quantized_apply(state.apply_fn, variables, scales, x,
                                 train=False))
    pck_q, err_q = pck(c_q)
    dq = np.abs(c_q - c_bf16).max(axis=-1)[vis > 0].mean()
    print(f"(b) int8 PTQ:      PCK@0.2={pck_q:.4f} mean_err={err_q:.3f}"
          f"  coord_delta={dq:.3f}px", flush=True)

    eng = Int8Engine.build(variables, backbone="resnet50", calib=[imgs])
    c_e = decode(eng(jnp.asarray(imgs)))
    pck_e, err_e = pck(c_e)
    de = np.abs(c_e - c_bf16).max(axis=-1)[vis > 0].mean()
    print(f"(c) int8 engine:   PCK@0.2={pck_e:.4f} mean_err={err_e:.3f}"
          f"  coord_delta={de:.3f}px", flush=True)

    peng = PallasServingEngine.build(variables, calib=imgs)
    hm_p = jax.jit(peng.forward)(jnp.asarray(imgs))
    c_p = decode(hm_p)
    pck_p, err_p = pck(c_p)
    dp = np.abs(c_p - c_bf16).max(axis=-1)[vis > 0].mean()
    print(f"(d) Pallas engine: PCK@0.2={pck_p:.4f} mean_err={err_p:.3f}"
          f"  coord_delta={dp:.3f}px", flush=True)

    for name, p, d in (("ptq", pck_q, dq), ("int8_engine", pck_e, de),
                       ("pallas_engine", pck_p, dp)):
        assert abs(p - pck_bf16) < 0.005, (name, pck_bf16, p)
        assert d < 0.5, (name, d)
    print("PARITY GATE PASSED: all int8 paths within 0.5 pt PCK / "
          "0.5 px of bf16 on trained R50-256x192 weights", flush=True)


if __name__ == "__main__":
    main()
