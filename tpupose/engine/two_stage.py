"""Two-stage pose: detector boxes -> on-device crops -> batched top-down
pose -> frame coordinates.

BASELINE config 5 names this exact shape ("detector crops -> batched pose
-> DINO-feature tracking", reference surface pose/dino_tracking.ipynb; the
reference would do the crops with host cv2). TPU-native version: the
detector's boxes never leave the device — one compiled program turns a
frame batch + (B, D, 4) boxes into (B, D, K) keypoints:

    boxes -> center/scale (MSRA aspect + 1.25 padding, the same convention
    as data/coco.py) -> dst->src matrices -> Pallas multi-crop warp
    (ops/pallas_warp.pallas_crops_from_frames: D crops per frame with the
    frame resident in VMEM, zero copies) -> heatmap model on the (B*D)
    crop batch -> DARK decode -> back-projection to frame pixels.

Static shapes throughout: D = max_persons crops per frame, invalid slots
carry a degenerate identity box and are masked by `valid`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def boxes_to_center_scale(boxes_xyxy, aspect: float, padding: float = 1.25):
    """(..., 4) xyxy -> center (..., 2), scale (..., 2) with the target
    aspect ratio and padding (device twin of data/coco._box_to_center_scale)."""
    x0, y0, x1, y1 = (boxes_xyxy[..., i] for i in range(4))
    w = jnp.maximum(x1 - x0, 1.0)
    h = jnp.maximum(y1 - y0, 1.0)
    cx, cy = (x0 + x1) * 0.5, (y0 + y1) * 0.5
    wide = w > aspect * h
    w2 = jnp.where(wide, w, h * aspect)
    h2 = jnp.where(wide, w / aspect, h)
    center = jnp.stack([cx, cy], -1)
    scale = jnp.stack([w2, h2], -1) * padding
    return center, scale


def person_crops(frames, boxes, valid, crop_size, padding: float = 1.25,
                 udp: bool = False):
    """Warp detector boxes out of frames on device.

    frames (B, Hf, Wf, 3); boxes (B, D, 4) xyxy frame px; valid (B, D).
    Returns (crops (B*D, H, W, 3), center (B*D, 2), scale (B*D, 2)) —
    the shared crop front-end of the two-stage step, also usable alone
    (e.g. to harvest representative crops for int8 calibration)."""
    from tpupose.ops.affine import get_affine_matrix
    from tpupose.ops.pallas_warp import crops_from_frames_auto

    B, D = boxes.shape[0], boxes.shape[1]
    H, W = crop_size
    aspect = W / H
    # invalid slots: replace with a safe unit box at the frame corner
    safe = jnp.asarray([0.0, 0.0, 2.0, 2.0])
    bx = jnp.where(valid[..., None] > 0, boxes, safe)
    center, scale = boxes_to_center_scale(bx, aspect, padding)
    center = center.reshape(B * D, 2)
    scale = scale.reshape(B * D, 2)
    mats = jax.vmap(lambda c, s: get_affine_matrix(
        c, s, 0.0, (H, W), udp=udp))(center, scale)
    return crops_from_frames_auto(frames, mats, (H, W)), center, scale


class TwoStagePosePredictor:
    """detector (optional) + top-down heatmap pose over device-side crops.

    pose_state: heatmap-family TrainState (SimpleBaseline / HRNet).
    crop_size: pose model input (H, W); heatmap_size: its output grid.
    detector: an optional YoloPosePredictor-like callable returning
      {"boxes","scores","valid"} for a frame batch; pose_from_boxes can
      also be fed boxes from any source.
    """

    def __init__(self, pose_state, crop_size, heatmap_size,
                 max_persons: int = 16, decode: str = "dark",
                 padding: float = 1.25, detector=None, quant_scales=None,
                 udp: bool = False):
        self.pose_state = pose_state
        self.crop_size = tuple(crop_size)
        self.heatmap_size = tuple(heatmap_size)
        self.max_persons = max_persons
        self.decode = decode
        self.padding = padding
        self.detector = detector
        # int8 serving of the stage-2 heatmap model (ops/quant.py scales;
        # HeatmapPredictor.calibrate_int8 on representative crops)
        self.quant_scales = dict(quant_scales) if quant_scales else None
        # unit-length crop/back-projection convention (match the pose
        # model's training, cfg.data.udp)
        self.udp = udp
        # decode/udp/quant_scales/crop_size are baked into the trace at
        # the first call; construct a new predictor to change them
        self._step = jax.jit(self._pose_step)

    def _pose_step(self, state, frames, boxes, valid):
        """frames (B, Hf, Wf, 3) uint8/float; boxes (B, D, 4) xyxy frame px;
        valid (B, D) -> coords (B, D, K, 2) frame px, scores (B, D, K)."""
        from tpupose.ops.affine import transform_preds
        from tpupose.ops.decode import decode_heatmaps
        from tpupose.ops.preprocess import normalize_images

        B, D = boxes.shape[0], boxes.shape[1]
        crops, center, scale = person_crops(
            frames, boxes, valid, self.crop_size, self.padding, self.udp)
        x = normalize_images(crops)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        if self.quant_scales is not None:
            from tpupose.ops.quant import quantized_apply

            hm = quantized_apply(state.apply_fn, variables,
                                 self.quant_scales, x, train=False)
        else:
            hm = state.apply_fn(variables, x, train=False)     # (B*D,Hh,Wh,K)
        hm = jnp.transpose(hm, (0, 3, 1, 2))
        coords, scores = decode_heatmaps(hm, self.decode)
        src = jax.vmap(lambda c, ct, sc: transform_preds(
            c, ct, sc, self.heatmap_size, udp=self.udp))(
            coords, center, scale)
        K = src.shape[-2]
        return (src.reshape(B, D, K, 2), scores.reshape(B, D, K))

    def pose_from_boxes(self, frames, boxes, valid):
        """numpy in/out; one device round trip."""
        coords, scores = jax.device_get(self._step(
            self.pose_state, jnp.asarray(frames), jnp.asarray(boxes),
            jnp.asarray(valid)))
        return coords, scores

    def dispatch_from_det(self, frames, det_out):
        """Chain stage 2 directly onto a YoloPosePredictor.dispatch result
        ON DEVICE: det_out is the dispatched (boxes, scores, classes,
        kpts, valid) tuple; the boxes never visit the host between stages.
        Returns on-device results for fetch() — pairing the two lets a
        caller pipeline whole two-stage chunks like single-stage ones."""
        b, s, v = det_out[0], det_out[1], det_out[4]
        D = self.max_persons
        boxes, scores, valid = b[:, :D], s[:, :D], v[:, :D]
        coords, pscores = self._step(self.pose_state, jnp.asarray(frames),
                                     boxes, valid)
        out = (boxes, scores, valid, coords, pscores)
        if len(det_out) > 5:             # detector appearance embeddings
            out = out + (det_out[5][:, :D],)
        return out

    @staticmethod
    def fetch(out):
        """One device_get for the whole two-stage chunk result."""
        got = jax.device_get(out)
        boxes, scores, valid, coords, pscores = got[:5]
        kpts = np.concatenate([coords, pscores[..., None]], -1)
        res = {"boxes": boxes, "det_scores": scores, "valid": valid,
               "keypoints": kpts}
        if len(got) > 5:
            res["features"] = got[5]
        return res

    def __call__(self, frames):
        """frames (B, Hf, Wf, 3) uint8 -> dict with detector boxes + refined
        keypoints (B, D, K, 3) [x, y, score] in frame pixels.

        When the detector exposes `dispatch` (YoloPosePredictor does),
        the two stages chain fully on device — one frame upload, one
        result fetch, no host sync between stages. The dict fallback
        (arbitrary detector callables) pays the extra round trip."""
        if self.detector is None:
            raise ValueError("no detector attached; use pose_from_boxes")
        if hasattr(self.detector, "dispatch"):
            arr = jnp.asarray(frames)
            return self.fetch(self.dispatch_from_det(
                arr, self.detector.dispatch(arr)))
        det = self.detector(frames)
        D = self.max_persons
        boxes = det["boxes"][:, :D]
        valid = det["valid"][:, :D]
        coords, scores = self.pose_from_boxes(frames, boxes, valid)
        kpts = np.concatenate([coords, scores[..., None]], -1)
        return {"boxes": boxes, "det_scores": det["scores"][:, :D],
                "valid": valid, "keypoints": kpts}
