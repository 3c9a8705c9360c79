"""Inference/visualization CLI (the HPE/test.py analog).

Capability parity with run_inference (reference: HPE/test.py:284-396):
load weights -> resize -> forward -> pose NMS -> rescale coords -> render.
Headless: draws detections onto images and writes PNG files instead of a
cv2.imshow UI loop (SURVEY.md §7 step 5).

Usage:
    python -m tpupose.cli.test --cfg cfg.yaml --ckpt out/ckpt \
        images_dir=folder/ output_dir=viz/
"""

from __future__ import annotations

import os

import numpy as np

from tpupose.configs import default_config, parse_args, update_config
from tpupose.utils.logging import printS, printT, printW

# skeleton for the reference's 4-kpt object poses: 0-1-2-3-0 + midline
# (HPE/test.py:189-277 draw_detections)
DEFAULT_SKELETON_4 = ((0, 1), (1, 2), (2, 3), (3, 0))

# COCO-17 person skeleton (limbs by keypoint index)
COCO_SKELETON_17 = ((15, 13), (13, 11), (16, 14), (14, 12), (11, 12),
                    (5, 11), (6, 12), (5, 6), (5, 7), (6, 8), (7, 9),
                    (8, 10), (1, 2), (0, 1), (0, 2), (1, 3), (2, 4),
                    (3, 5), (4, 6))


def draw_detections(image, keypoints, scores, valid, skeleton=None, radius=3):
    """Pure-NumPy renderer: dots + skeleton lines onto an RGB uint8 image."""
    img = image.copy()
    H, W = img.shape[:2]
    K = keypoints.shape[1]
    if skeleton is None:
        skeleton = (DEFAULT_SKELETON_4 if K == 4
                    else COCO_SKELETON_17 if K == 17 else ())

    def dot(x, y, color):
        x, y = int(round(x)), int(round(y))
        if 0 <= x < W and 0 <= y < H:
            y0, y1 = max(0, y - radius), min(H, y + radius + 1)
            x0, x1 = max(0, x - radius), min(W, x + radius + 1)
            img[y0:y1, x0:x1] = color

    def line(p, q, color):
        n = int(max(abs(q[0] - p[0]), abs(q[1] - p[1]), 1))
        for t in np.linspace(0, 1, n * 2):
            dot(p[0] + (q[0] - p[0]) * t, p[1] + (q[1] - p[1]) * t, color)

    for i in range(keypoints.shape[0]):
        if not valid[i]:
            continue
        kps = keypoints[i]
        for a, b in skeleton:
            if kps[a, 2] > 0.5 and kps[b, 2] > 0.5:
                line(kps[a, :2], kps[b, :2], (0, 255, 0))
        for k in range(K):
            if kps[k, 2] > 0.5:
                dot(kps[k, 0], kps[k, 1], (255, 0, 0))
    return img


def run_inference(cfg, images_dir: str, output_dir: str, weights: str = ""):
    import glob

    import jax
    import jax.numpy as jnp
    import optax
    from PIL import Image

    from tpupose.engine.builder import Builder
    from tpupose.engine.checkpoint import CheckpointManager
    from tpupose.engine.predictor import YoloPosePredictor
    from tpupose.engine.train_state import create_train_state

    os.makedirs(output_dir, exist_ok=True)
    builder = Builder(cfg)
    model = builder.model()
    H, W = cfg.data.image_size
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, H, W, 3), jnp.float32)
    state = create_train_state(model, rng, sample, optax.sgd(0.0))
    if weights:
        from tpupose.engine.checkpoint import restore_path

        state, _ = restore_path(state, weights)   # supports <dir>@best
    else:
        printW("no --ckpt given: running with random weights")

    paths = sorted(
        p for ext in ("*.jpg", "*.jpeg", "*.png")
        for p in glob.glob(os.path.join(images_dir, ext)))

    # eval.int8: quantized serving (ops/quant.py) calibrated on the first
    # image of the run
    bottom_up = cfg.model.name == "bottom_up"
    quant_scales = None
    if cfg.eval.int8 and paths:
        from PIL import Image as _Image

        from tpupose.engine.predictor import BottomUpPredictor

        first = np.asarray(_Image.open(paths[0]).convert("RGB")
                           .resize((W, H)), np.uint8)[None]
        calib = (BottomUpPredictor if bottom_up
                 else YoloPosePredictor).calibrate_int8
        quant_scales = calib(state, first)
        printT(f"int8 serving: calibrated {len(quant_scales)} layers")

    if bottom_up:
        # detector-free multi-person: forward + AE grouping in one program
        from PIL import Image as _Image

        from tpupose.engine.predictor import BottomUpPredictor

        predictor = BottomUpPredictor(
            state, max_people=cfg.data.max_instances,
            score_threshold=getattr(cfg.eval, "ae_score_threshold", 0.1),
            tag_threshold=getattr(cfg.eval, "ae_tag_threshold", 1.0),
            quant_scales=quant_scales)
        for p in paths:
            pil = _Image.open(p).convert("RGB")
            arr = np.asarray(pil.resize((W, H)), np.uint8)
            out = predictor(arr[None])
            w0, h0 = pil.size
            kp = np.concatenate(
                [out["coords"][0] * [w0 / W, h0 / H],
                 out["scores"][0][..., None]], axis=-1)
            img = draw_detections(np.asarray(pil, np.uint8), kp,
                                  out["person_scores"][0],
                                  out["person_mask"][0])
            out_path = os.path.join(output_dir, os.path.basename(p))
            _Image.fromarray(img).save(out_path)
            printT(f"{p}: {int(out['person_mask'][0].sum())} people "
                   f"-> {out_path}")
        printS(f"processed {len(paths)} images")
        return

    # forward (+ kpt-extent or DFL boxes) + on-device NMS is ONE compiled
    # program with a single host fetch (engine/predictor.py) — the
    # reference's host-side conf-filter/NMS loop (HPE/test.py:69-185)
    # fused on device.
    predictor = YoloPosePredictor(
        state, num_classes=cfg.model.num_classes,
        num_keypoints=cfg.model.num_keypoints,
        conf_threshold=cfg.eval.conf_threshold,
        iou_threshold=cfg.eval.iou_threshold,
        max_detections=cfg.eval.max_detections,
        has_box_branch=(cfg.model.reg_max > 0 or cfg.loss.name == "v8_pose"),
        quant_scales=quant_scales)

    # decode+resize prefetches on a thread; detection is software-
    # pipelined (predictor.pipeline) so the per-image device round trip
    # overlaps the next images' loads and forwards; rendering consumes
    # results strictly in order.
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    def load(p):
        pil = Image.open(p).convert("RGB")
        return pil, np.asarray(pil.resize((W, H)), np.uint8)

    pool = ThreadPoolExecutor(max_workers=2)

    def loaded():
        q: deque = deque()
        for p in paths:
            q.append(pool.submit(load, p))
            if len(q) > 2:
                yield q.popleft().result()
        while q:
            yield q.popleft().result()

    metas: deque = deque()   # bounded by the pipeline's in-flight depth

    def arrays():
        for p, (pil, arr) in zip(paths, loaded()):
            metas.append((p, pil))
            yield arr[None]

    for det in predictor.pipeline(arrays()):
        p, pil = metas.popleft()
        w0, h0 = pil.size
        ok = det["keypoints"][0].copy()
        ov = det["valid"][0]
        # rescale to original resolution (HPE/test.py:356-361)
        ok[..., 0] *= w0 / W
        ok[..., 1] *= h0 / H
        out = draw_detections(np.asarray(pil, np.uint8), ok,
                              det["scores"][0], ov)
        out_path = os.path.join(output_dir, os.path.basename(p))
        Image.fromarray(out).save(out_path)
        printT(f"{p}: {int(ov.sum())} detections -> {out_path}")
    pool.shutdown(wait=False)
    printS(f"processed {len(paths)} images")


def main(argv=None):
    args = parse_args(argv)
    extra = {}
    rest = []
    for item in args.opts:
        k, v = item.split("=", 1)
        if k in ("images_dir", "output_dir"):
            extra[k] = v
        else:
            rest.append(item)
    args.opts = rest
    cfg = update_config(default_config(), args)
    run_inference(cfg, extra.get("images_dir", "images"),
                  extra.get("output_dir", "viz"), args.ckpt)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
