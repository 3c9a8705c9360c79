"""Multi-person video pipeline CLI: detections -> batched pose -> tracking.

Capability parity with the reference's video pipeline surface
(pose/dino_tracking.ipynb; BASELINE.json config 5). Headless: consumes a
directory of frames (natural-sort order, like the reference's natsort
inference loop HPE/test.py), runs the single-stage pose model batched,
feeds the appearance tracker, and writes annotated frames + a JSONL of
per-frame tracks.

Usage:
    python -m tpupose.cli.video --cfg tpupose/configs/method/dinov3_pose.yaml \
        --ckpt out/ckpt frames_dir=frames/ output_dir=tracked/
"""

from __future__ import annotations

import glob
import json
import os
import re

import numpy as np

from tpupose.configs import default_config, parse_args, update_config
from tpupose.utils.logging import printS, printT


def natural_sort(paths):
    def key(p):
        return [int(t) if t.isdigit() else t
                for t in re.split(r"(\d+)", os.path.basename(p))]

    return sorted(paths, key=key)


def run_video(cfg, frames_dir: str, output_dir: str, weights: str = "",
              pose_cfg: str = "", pose_ckpt: str = ""):
    import jax
    import jax.numpy as jnp
    import optax
    from PIL import Image

    from tpupose.cli.test import draw_detections
    from tpupose.engine.builder import Builder
    from tpupose.engine.checkpoint import CheckpointManager
    from tpupose.engine.predictor import YoloPosePredictor
    from tpupose.engine.tracker import PoseTracker
    from tpupose.engine.train_state import create_train_state

    os.makedirs(output_dir, exist_ok=True)
    frames = natural_sort(
        p for e in ("*.jpg", "*.jpeg", "*.png")
        for p in glob.glob(os.path.join(frames_dir, e)))
    builder = Builder(cfg)
    model = builder.model()
    H, W = cfg.data.image_size
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, H, W, 3), jnp.float32),
                               optax.sgd(0.0))
    if weights:
        from tpupose.engine.checkpoint import restore_path

        state, _ = restore_path(state, weights)   # supports <dir>@best

    # eval.int8: quantized serving (ops/quant.py) calibrated on the first
    # frame of the run (detector) / the first chunk's crops (stage 2)
    det_scales = None
    if cfg.eval.int8:
        if frames:
            first = np.asarray(Image.open(frames[0]).convert("RGB")
                               .resize((W, H)), np.uint8)[None]
            det_scales = YoloPosePredictor.calibrate_int8(state, first)
            printT(f"int8 serving: detector calibrated "
                   f"({len(det_scales)} layers)")

    predictor = YoloPosePredictor(
        state, num_classes=cfg.model.num_classes,
        num_keypoints=cfg.model.num_keypoints,
        conf_threshold=cfg.eval.conf_threshold,
        iou_threshold=cfg.eval.iou_threshold,
        max_detections=cfg.eval.max_detections,
        has_box_branch=(cfg.model.reg_max > 0 or cfg.loss.name == "v8_pose"),
        quant_scales=det_scales,
        appearance=True)   # on-device DINO-feature embeddings per detection
    tracker = PoseTracker()

    # Optional two-stage refinement (BASELINE config 5's literal shape:
    # detector crops -> batched top-down pose): a second config names the
    # heatmap model; crops are warped out of the frame ON DEVICE
    # (ops/pallas_warp) and the detector's keypoints are replaced by the
    # top-down model's.
    two_stage = None
    n_kpts = cfg.model.num_keypoints
    if pose_cfg:
        from tpupose.configs import load_config
        from tpupose.engine.two_stage import TwoStagePosePredictor

        pcfg = load_config(pose_cfg)
        pbuilder = Builder(pcfg)
        pmodel = pbuilder.model()
        pH, pW = pcfg.data.image_size
        pstate = create_train_state(pmodel, jax.random.PRNGKey(1),
                                    jnp.zeros((1, pH, pW, 3), jnp.float32),
                                    optax.sgd(0.0))
        if pose_ckpt:
            from tpupose.engine.checkpoint import restore_path

            pstate, _ = restore_path(pstate, pose_ckpt)
        pose_scales = None
        max_persons = min(cfg.eval.max_detections, 16)
        if cfg.eval.int8 and frames:
            from tpupose.engine.predictor import HeatmapPredictor
            from tpupose.engine.two_stage import person_crops

            # calibrate on what stage 2 actually sees at inference: tight
            # person crops warped out of the first frame by the detector's
            # boxes (a squashed full frame has different activation
            # statistics and would miscalibrate the per-layer scales)
            first = np.asarray(Image.open(frames[0]).convert("RGB")
                               .resize((W, H)), np.uint8)[None]
            det = predictor(first)
            crops, _, _ = person_crops(
                jnp.asarray(first), jnp.asarray(det["boxes"][:, :max_persons]),
                jnp.asarray(det["valid"][:, :max_persons]), (pH, pW),
                udp=pcfg.data.udp)
            keep = np.asarray(det["valid"][0, :max_persons]).astype(bool)
            calib = np.asarray(crops).astype(np.uint8)
            calib = calib[keep] if keep.any() else calib[:1]
            pose_scales = HeatmapPredictor.calibrate_int8(pstate, calib)
            printT(f"int8 serving: stage-2 pose calibrated on "
                   f"{len(calib)} person crops ({len(pose_scales)} layers)")
        two_stage = TwoStagePosePredictor(
            pstate, crop_size=(pH, pW),
            heatmap_size=tuple(pcfg.model.heatmap_size),
            max_persons=max_persons,
            decode=pcfg.eval.decode,
            udp=pcfg.data.udp,
            quant_scales=pose_scales)
        n_kpts = pcfg.model.num_keypoints

    # Detection is batched on device (VB frames per program — padding the
    # tail keeps one compiled shape); tracking stays causal per frame on
    # the host. Frame decode for the NEXT chunk overlaps the device pass
    # for the current one via a one-deep thread prefetch.
    VB = max(1, int(getattr(cfg.eval, "video_batch", 8)))

    def load_chunk(chunk_paths):
        pils = [Image.open(p).convert("RGB") for p in chunk_paths]
        arr = np.stack([np.asarray(p.resize((W, H)), np.uint8) for p in pils])
        if len(pils) < VB:  # static batch shape: repeat-pad the tail
            arr = np.concatenate(
                [arr, np.repeat(arr[-1:], VB - len(pils), axis=0)])
        # start the H2D transfer here (async) so it overlaps the device
        # pass on the PREVIOUS chunk — the hot loop then consumes an
        # already-committed device array.
        return pils, jax.device_put(arr)

    chunks = [frames[i:i + VB] for i in range(0, len(frames), VB)]
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=1)
    pending = pool.submit(load_chunk, chunks[0]) if chunks else None

    # Detection is software-pipelined: the device program for chunk i+1/i+2
    # is dispatched (and its result fetch started on a small thread pool)
    # BEFORE chunk i's results are consumed, so device compute, result
    # round trips, and host tracking all overlap. Tracking stays causal:
    # the in-flight queue is drained strictly in order. The two-stage
    # variant chains the pose program onto the detector's device outputs
    # (TwoStagePosePredictor.dispatch_from_det — boxes never visit the
    # host between stages), so it pipelines identically.
    fetch_pool = ThreadPoolExecutor(max_workers=2)
    inflight: deque = deque()       # (chunk_paths, pils, det_future)
    depth = 2

    log_path = os.path.join(output_dir, "tracks.jsonl")
    fi = 0
    with open(log_path, "w") as log:
        def drain_one():
            nonlocal fi
            chunk, pils, fut = inflight.popleft()
            det = fut.result()
            for bi, (p, pil) in enumerate(zip(chunk, pils)):
                w0, h0 = pil.size
                v = det["valid"][bi]
                boxes = det["boxes"][bi][v]
                kpts = det["keypoints"][bi][v]
                # appearance embedding: the detector backbone's deepest
                # feature map ROI-pooled at each box ON DEVICE
                # (ops/roi.roi_mean_pool) — true DINO-feature tracking;
                # geometry is the fallback when features are absent
                if "features" in det:
                    feats = det["features"][bi][v]
                else:
                    feats = (kpts[..., :2].reshape(len(boxes), -1)
                             / max(H, W) if len(boxes)
                             else np.zeros((0, 2 * n_kpts)))
                tracks = tracker.update(boxes, feats, kpts)
                log.write(json.dumps({
                    "frame": fi, "file": os.path.basename(p),
                    "tracks": [{"id": int(t), "box": b.tolist(),
                                "keypoints": k.tolist()} for t, b, k in tracks],
                }) + "\n")
                if tracks:
                    tk = np.stack([k for _, _, k in tracks])
                    tk[..., 0] *= w0 / W
                    tk[..., 1] *= h0 / H
                    out = draw_detections(np.asarray(pil, np.uint8), tk,
                                          np.ones(len(tracks)),
                                          np.ones(len(tracks), bool))
                else:
                    out = np.asarray(pil, np.uint8)
                Image.fromarray(out).save(
                    os.path.join(output_dir, os.path.basename(p)))
                printT(f"frame {fi}: {len(tracks)} tracks")
                fi += 1

        for ci, chunk in enumerate(chunks):
            pils, arr = pending.result()
            pending = (pool.submit(load_chunk, chunks[ci + 1])
                       if ci + 1 < len(chunks) else None)
            out = predictor.dispatch(arr)
            if two_stage is not None:
                fut = fetch_pool.submit(
                    two_stage.fetch, two_stage.dispatch_from_det(arr, out))
            else:
                fut = fetch_pool.submit(predictor.fetch, out)
            inflight.append((chunk, pils, fut))
            while len(inflight) > depth:
                drain_one()
        while inflight:
            drain_one()
    pool.shutdown()
    fetch_pool.shutdown()
    printS(f"{len(frames)} frames -> {output_dir} (log: {log_path})")


def main(argv=None):
    args = parse_args(argv)
    extra = {}
    rest = []
    for item in args.opts:
        k, v = item.split("=", 1)
        if k in ("frames_dir", "output_dir", "pose_cfg", "pose_ckpt"):
            extra[k] = v
        else:
            rest.append(item)
    args.opts = rest
    cfg = update_config(default_config(), args)
    run_video(cfg, extra.get("frames_dir", "frames"),
              extra.get("output_dir", "tracked"), args.ckpt,
              pose_cfg=extra.get("pose_cfg", ""),
              pose_ckpt=extra.get("pose_ckpt", ""))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
