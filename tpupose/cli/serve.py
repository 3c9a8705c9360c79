"""Serving CLI: expose a trained top-down pose model over HTTP with
dynamic micro-batching (engine/server.py).

The reference has no deployment surface (its inference path is an
interactive cv2 loop, HPE/test.py:284-396); this is the TPU-native
production analog: bucketed static-shape programs compiled at startup,
requests coalesced into fused forward+flip+DARK-decode batches.

Usage:
    python -m tpupose.cli.serve --cfg cfg.yaml --ckpt out/ckpt@best \
        serve.port=8080 serve.max_batch=64 serve.window_ms=4

Config knobs (dotted overrides, all optional):
    serve.host / serve.port / serve.max_batch / serve.window_ms
    eval.flip_test / eval.decode / eval.int8_engine apply as in eval.
"""

from __future__ import annotations

import numpy as np

from tpupose.configs import default_config, parse_args, update_config
from tpupose.utils.logging import printS, printT, printW

HEATMAP_FAMILIES = ("simple_baseline", "hrnet", "vitpose")


def build_predictor(cfg, weights: str = ""):
    import jax
    import jax.numpy as jnp
    import optax

    from tpupose.engine.builder import Builder
    from tpupose.engine.evaluator import COCO_FLIP_PAIRS
    from tpupose.engine.predictor import HeatmapPredictor
    from tpupose.engine.train_state import create_train_state

    if cfg.model.name not in HEATMAP_FAMILIES:
        raise SystemExit(
            f"serve supports the top-down heatmap families "
            f"{HEATMAP_FAMILIES}, got model.name={cfg.model.name!r}")
    builder = Builder(cfg)
    model = builder.model()
    H, W = cfg.data.image_size
    sample = jnp.zeros((1, H, W, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), sample,
                               optax.sgd(0.0))
    if weights:
        from tpupose.engine.checkpoint import restore_path

        state, _ = restore_path(state, weights)
    else:
        printW("no --ckpt given: serving random weights")

    int8_engine = None
    if cfg.eval.int8_engine:
        from tpupose.ops.int8_engine import Int8Engine

        bb = cfg.model.backbone
        if not (bb.startswith("resnet") or bb.startswith("hrnet")):
            raise SystemExit("eval.int8_engine serves the SimpleBaseline/"
                             f"HRNet families only (backbone={bb!r})")
        calib = np.random.randint(0, 256, (8, H, W, 3), np.uint8)
        int8_engine = Int8Engine.build(
            {"params": state.params, "batch_stats": state.batch_stats},
            backbone=bb, calib=calib, decode_method=cfg.eval.decode,
            blur_kernel=cfg.eval.blur_kernel)
        printT("int8 engine built (synthetic calibration; pass real "
               "crops through eval for production scales)")

    pairs = COCO_FLIP_PAIRS if cfg.model.num_keypoints == 17 else None
    return HeatmapPredictor(
        state, cfg.model.heatmap_size, decode=cfg.eval.decode,
        flip_test=cfg.eval.flip_test and pairs is not None,
        flip_pairs=pairs, udp=cfg.data.udp, int8_engine=int8_engine)


def main(argv=None):
    args = parse_args(argv)
    cfg = update_config(default_config(), args)

    from tpupose.engine.server import PoseServer

    predictor = build_predictor(cfg, args.ckpt)
    serve = cfg.serve
    server = PoseServer(predictor, cfg.data.image_size, host=serve.host,
                        port=serve.port, max_batch=serve.max_batch,
                        window_ms=serve.window_ms,
                        model_name=f"{cfg.model.name}/{cfg.model.backbone}")
    printS(f"serving {cfg.model.name}/{cfg.model.backbone} on "
           f"http://{serve.host}:{server.port}  "
           f"(max_batch={serve.max_batch}, window={serve.window_ms}ms, "
           f"buckets={server.batcher.buckets})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        printT("shutting down")
        server.shutdown()


if __name__ == "__main__":
    main()
