"""Model-export CLI — serialize a trained model for deployment.

The reference declares exporter modules but ships them empty
(HPE/engine/exporter.py, pose/pose/engine/exporter.py — SURVEY.md §2.11);
this is the runnable surface over tpupose/engine/exporter.py:

- ``format=npz``: portable flat weights (framework-agnostic).
- ``format=stablehlo``: the family's FULL fused inference program
  (normalize -> forward -> flip-test -> decode -> back-project for the
  heatmap and simcc families; decode + on-device NMS for the yolo family)
  serialized via jax.export — loadable and runnable without the model
  code, the TPU analog of ONNX/torchscript export.

Usage:
    python -m tpupose.cli.export --cfg cfg.yaml --ckpt out/ckpt \
        out=export/model format=both batch=8 \
        [eval.int8=true calib=calib_images.npy]   # quantized program
"""

from __future__ import annotations

import numpy as np

from tpupose.configs import default_config, parse_args, update_config
from tpupose.utils.logging import printS, printW


def export_model(cfg, out: str, fmt: str = "both", batch: int = 8,
                 weights: str = "", calib: str = ""):
    import jax
    import jax.numpy as jnp
    import optax

    from tpupose.engine.builder import Builder
    from tpupose.engine.checkpoint import CheckpointManager
    from tpupose.engine.exporter import export_npz, export_stablehlo
    from tpupose.engine.train_state import create_train_state

    builder = Builder(cfg)
    model = builder.model()
    H, W = cfg.data.image_size
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, H, W, 3), jnp.float32),
                               optax.sgd(0.0))
    if weights:
        from tpupose.engine.checkpoint import restore_path

        state, _ = restore_path(state, weights)   # supports <dir>@best
    else:
        printW("no --ckpt given: exporting random weights")

    # eval.int8: bake the quantized serving program (ops/quant.py) into the
    # StableHLO export. Activation scales come from `calib=<.npy>` — an
    # (N, H, W, 3) uint8 array of representative inputs; without it,
    # calibration falls back to uniform noise (fine for smoke tests, NOT
    # for production accuracy).
    qscales = None
    if cfg.eval.int8 and fmt in ("stablehlo", "both"):
        if calib:
            cimgs = np.load(calib)
        else:
            printW("eval.int8 without calib=<images.npy>: calibrating on "
                   "random noise — use real inputs for production export")
            cimgs = np.random.RandomState(0).randint(
                0, 256, (min(batch, 8), H, W, 3)).astype(np.uint8)
        from tpupose.engine.predictor import (HeatmapPredictor,
                                              YoloPosePredictor)

        is_yolo = cfg.loss.name in ("pose_compute", "v8_pose")
        cal = (YoloPosePredictor if is_yolo else HeatmapPredictor)
        qscales = cal.calibrate_int8(state, cimgs)  # same normalize for
        # the bottom-up family (HeatmapPredictor.calibrate_int8 is shared)
        printS(f"int8 export: calibrated {len(qscales)} layers")

    written = []
    if fmt in ("npz", "both"):
        written.append(export_npz(state, out + ".npz"))
    if fmt in ("stablehlo", "both"):
        family = ("yolo" if cfg.loss.name in ("pose_compute", "v8_pose")
                  else "simcc" if cfg.loss.name == "simcc_kl"
                  else "bottom_up" if cfg.loss.name == "ae"
                  else "heatmap")
        imgs = np.zeros((batch, H, W, 3), np.uint8)
        if family == "bottom_up":
            from tpupose.engine.predictor import BottomUpPredictor

            pred = BottomUpPredictor(
                state, max_people=cfg.data.max_instances,
                score_threshold=getattr(cfg.eval, "ae_score_threshold", 0.1),
                tag_threshold=getattr(cfg.eval, "ae_tag_threshold", 1.0),
                quant_scales=qscales)
            fn = lambda images: pred._step(state, images)
            example = (imgs,)
        elif family == "yolo":
            from tpupose.engine.predictor import YoloPosePredictor

            pred = YoloPosePredictor(
                state, num_classes=cfg.model.num_classes,
                num_keypoints=cfg.model.num_keypoints,
                conf_threshold=cfg.eval.conf_threshold,
                iou_threshold=cfg.eval.iou_threshold,
                max_detections=cfg.eval.max_detections,
                has_box_branch=(cfg.model.reg_max > 0
                                or cfg.loss.name == "v8_pose"),
                quant_scales=qscales)
            fn = lambda images: pred._infer(state, images)
            example = (imgs,)
        else:
            from tpupose.engine.evaluator import TopDownEvaluator

            ev = TopDownEvaluator(state, tuple(cfg.model.heatmap_size),
                                  decode=cfg.eval.decode,
                                  flip_test=cfg.eval.flip_test,
                                  quant_scales=qscales, family=family)
            centers = np.tile([[W / 2, H / 2]], (batch, 1)).astype(np.float32)
            scales = np.tile([[W, H]], (batch, 1)).astype(np.float32)
            step = (ev._simcc_eval_step if family == "simcc"
                    else ev._eval_step)
            fn = lambda images, c, s: step(state, images, c, s)
            example = (imgs, centers, scales)
        written.append(export_stablehlo(fn, example, out + ".stablehlo"))
    printS("exported: " + ", ".join(written))
    return written


def main(argv=None):
    args = parse_args(argv)
    extra = {"out": "export/model", "format": "both", "batch": "8",
             "calib": ""}
    rest = []
    for item in args.opts:
        k, v = item.split("=", 1)
        if k in extra:
            extra[k] = v
        else:
            rest.append(item)
    args.opts = rest
    cfg = update_config(default_config(), args)
    export_model(cfg, extra["out"], extra["format"], int(extra["batch"]),
                 args.ckpt, calib=extra["calib"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
