"""Predictor — batched inference API.

The reference declares predictor modules but never implements them
(HPE/engine/predictor.py, pose/pose/engine/predictor.py are empty files —
SURVEY.md §2.11 "declared surface"). This is the working version: a
compiled end-to-end inference object for both model families.

- heatmap family: images -> heatmaps -> (flip-test) -> DARK decode ->
  source-coordinate keypoints.
- yolo family: images -> decoded grid predictions -> on-device NMS ->
  fixed-size detections.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class HeatmapPredictor:
    def __init__(self, state, heatmap_size, decode: str = "dark",
                 flip_test: bool = False, flip_pairs=None,
                 quant_scales=None, udp: bool = False, int8_engine=None):
        """quant_scales: {conv_path: amax} from `calibrate_int8` — serve
        the forward with int8 MXU convolutions (see ops/quant.py).
        int8_engine: an ops.int8_engine.Int8Engine built from this state —
        the stronger serving path (int8 activations end-to-end, BN +
        normalize folded into the convs; SimpleBaseline/HRNet families).
        udp: unit-length coordinate convention (must match training's
        cfg.data.udp)."""
        from tpupose.engine.evaluator import TopDownEvaluator

        self._ev = TopDownEvaluator(state, heatmap_size, decode=decode,
                                    flip_test=flip_test,
                                    flip_pairs=flip_pairs,
                                    quant_scales=quant_scales, udp=udp,
                                    int8_engine=int8_engine)

    @staticmethod
    def calibrate_int8(state, images):
        """Collect int8 activation scales from representative uint8 crop
        batches (iterable of (B, H, W, 3) arrays, or one array)."""
        from tpupose.ops.preprocess import normalize_images
        from tpupose.ops.quant import calibrate

        if hasattr(images, "shape"):
            images = [images]
        return calibrate(
            state.apply_fn,
            {"params": state.params, "batch_stats": state.batch_stats},
            images, preprocess=normalize_images, train=False)

    def __call__(self, images, centers=None, scales=None):
        """images: (B, H, W, 3) uint8 crops. centers/scales map results back
        to source coords; identity (crop coords) when omitted."""
        B = images.shape[0]
        H, W = images.shape[1:3]
        Hh, Wh = self._ev.heatmap_size
        if centers is None:
            centers = np.tile([[W / 2, H / 2]], (B, 1)).astype(np.float32)
        if scales is None:
            scales = np.tile([[W, H]], (B, 1)).astype(np.float32)
        return jax.device_get(self._ev._step(
            self._ev.state, jnp.asarray(images), jnp.asarray(centers),
            jnp.asarray(scales)))


class YoloPosePredictor:
    def __init__(self, state, num_classes: int, num_keypoints: int,
                 conf_threshold: float = 0.25, iou_threshold: float = 0.45,
                 max_detections: int = 100, has_box_branch: bool = False,
                 quant_scales=None, appearance: bool = False):
        self.state = state
        self.nc = num_classes
        self.K = num_keypoints
        self.conf = conf_threshold
        self.iou = iou_threshold
        self.max_det = max_detections
        # v8-style heads (PoseHead reg_max>0) decode real boxes first:
        # (B, A, 4 + nc + 3K); box-free heads derive boxes from keypoints
        self.has_box = has_box_branch
        # int8 serving: {path: amax} from calibrate_int8 (ops/quant.py);
        # dense+conv layers run on the MXU in int8, NMS/decode stay fp32
        self.quant_scales = dict(quant_scales) if quant_scales else None
        # appearance=True additionally returns per-detection DINO-feature
        # embeddings (backbone deepest map ROI-mean-pooled at the kept
        # boxes, ops/roi.py) — the tracker's appearance signal, computed
        # on device from features the detector already produced
        # (reference pose/dino_tracking.ipynb re-embeds host crops)
        self.appearance = appearance
        self._step = jax.jit(self._infer)

    @staticmethod
    def calibrate_int8(state, images):
        """Collect int8 activation scales from representative uint8 frame
        batches (iterable of (B, H, W, 3) arrays, or one array)."""
        from functools import partial

        from tpupose.ops.preprocess import normalize_images
        from tpupose.ops.quant import calibrate

        if hasattr(images, "shape"):
            images = [images]
        return calibrate(
            state.apply_fn,
            {"params": state.params, "batch_stats": state.batch_stats},
            images, preprocess=partial(normalize_images, scale_only=True),
            train=False)

    @staticmethod
    def _backbone_filter(mod, method):
        return (method == "__call__"
                and type(mod).__name__ in ("ConvNeXt", "DinoViT"))

    @staticmethod
    def _deepest_feature(captured):
        """Pull the deepest backbone map out of a capture_intermediates
        tree: ConvNeXt returns a stage list (take the stride-32 map),
        DinoViT a dict with per-block 'intermediates' (take the last)."""
        sub = next(iter(captured["intermediates"].values()))
        val = sub["__call__"][0]
        if isinstance(val, dict):                  # DinoViT output
            inter = val["intermediates"]
            return inter[max(inter.keys())]
        return val[-1]                             # ConvNeXt stage list

    def _infer(self, state, images):
        from tpupose.ops.nms import batched_pose_nms
        from tpupose.ops.preprocess import normalize_images

        x = normalize_images(images, scale_only=True)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        kw = {}
        if self.appearance:
            kw = dict(capture_intermediates=self._backbone_filter,
                      mutable=["intermediates"])
        if self.quant_scales is not None:
            from tpupose.ops.quant import quantized_apply

            dec = quantized_apply(state.apply_fn, variables,
                                  self.quant_scales, x, train=False, **kw)
        else:
            dec = state.apply_fn(variables, x, train=False, **kw)
            # (B, A, [4 +] nc + 3K)
        fmap = None
        if self.appearance:
            dec, captured = dec
            fmap = self._deepest_feature(captured)
        off = 4 if self.has_box else 0
        cls = dec[..., off: off + self.nc]
        scores = cls.max(-1)
        classes = cls.argmax(-1).astype(jnp.int32)
        kpts = dec[..., off + self.nc:].reshape(dec.shape[0], -1, self.K, 3)
        if self.has_box:
            from tpupose.losses.bbox import xywh2xyxy

            boxes = xywh2xyxy(dec[..., :4])
        else:
            xs, ys = kpts[..., 0], kpts[..., 1]
            boxes = jnp.stack([xs.min(2), ys.min(2), xs.max(2), ys.max(2)], -1)

        def per_image(b, s, c, k):
            return batched_pose_nms(b, s, c, k, self.iou, self.conf,
                                    self.max_det)

        out = jax.vmap(per_image)(boxes, scores, classes, kpts)
        if fmap is not None:
            from tpupose.ops.roi import roi_mean_pool

            H, W = images.shape[1:3]
            emb = roi_mean_pool(fmap, out[0], (H, W))
            # bf16 on the wire: halves the (B, D, C) fetch through the
            # tunnel; the tracker re-normalizes in fp32 on host
            out = out + (emb.astype(jnp.bfloat16),)
        return out

    def dispatch(self, images):
        """Enqueue the detection program for one batch and return the
        on-device results WITHOUT fetching them. JAX dispatch is async, so
        this returns immediately; pair with fetch() to pipeline several
        batches' device work against result transfers (a lone
        dispatch+fetch pays the full host<->device round trip per call)."""
        return self._step(self.state, jnp.asarray(images))

    @staticmethod
    def fetch(out):
        """Fetch dispatched results. One device_get for all arrays: a
        single host round trip instead of one per array (matters when the
        device sits behind a network tunnel)."""
        got = jax.device_get(out)
        b, s, c, k, v = got[:5]
        res = {"boxes": b, "scores": s, "classes": c, "keypoints": k,
               "valid": v}
        if len(got) > 5:                 # appearance=True embeddings
            res["features"] = got[5]
        return res

    def __call__(self, images):
        """images: (B, H, W, 3) uint8. Returns dict of fixed-size arrays:
        boxes (B, D, 4), scores (B, D), classes (B, D),
        keypoints (B, D, K, 3), valid (B, D)."""
        return self.fetch(self.dispatch(images))

    def pipeline(self, arrays, depth: int = 2, workers: int = 2):
        """Yield detection dicts for an iterable of image batches, in
        order, overlapping device execution with result fetches.

        Up to `depth`+1 batches are in flight; `workers` threads fetch
        concurrently so transfer round trips overlap each other as well as
        device compute (measured 22 -> 39 fps on the 8-frame video chunks
        through the axon tunnel vs. the sequential call-per-chunk loop).
        Streaming latency rises by `depth` batches — use depth=0 for a
        latency-critical consumer."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=max(1, workers))
        q: deque = deque()
        try:
            for arr in arrays:
                q.append(pool.submit(self.fetch, self.dispatch(arr)))
                if len(q) > depth:
                    yield q.popleft().result()
            while q:
                yield q.popleft().result()
        finally:
            pool.shutdown(wait=False)


class BottomUpPredictor:
    """Detector-free multi-person inference: full frames in, grouped
    people out (models/bottom_up.py + ops/ae_decode.py).

    One jitted program: normalize -> trunk forward -> per-joint peak
    top-k -> greedy AE tag grouping; only the fixed-size person arrays
    return to host. Coordinates are scaled from the stride-4 grid back to
    input pixels on device.
    """

    def __init__(self, state, max_people: int = 30,
                 score_threshold: float = 0.1, tag_threshold: float = 1.0,
                 quant_scales=None, flip_test: bool = False,
                 flip_pairs=None):
        """flip_test mirror-averages heatmaps (joints swapped by
        flip_pairs); tags stay from the direct pass — a flipped forward
        embeds in a different tag space."""
        import numpy as _np

        from tpupose.models.bottom_up import BottomUpPose
        from tpupose.ops.ae_decode import decode_ae
        from tpupose.ops.decode import flip_back
        from tpupose.ops.preprocess import normalize_images
        from tpupose.ops.quant import quantized_apply

        self.state = state
        scales_map = dict(quant_scales) if quant_scales else None
        pairs = _np.asarray(flip_pairs if flip_pairs is not None
                            else _np.zeros((0, 2), _np.int64))
        # without flip pairs, mirroring would average each joint channel
        # with its contralateral location — refuse silently-wrong results
        flip_test = flip_test and len(pairs) > 0

        def infer(state, images):
            H, W = images.shape[1:3]
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}

            def fwd(x):
                if scales_map is not None:
                    return quantized_apply(state.apply_fn, variables,
                                           scales_map, normalize_images(x),
                                           train=False)
                return state.apply_fn(variables, normalize_images(x),
                                      train=False)

            pred = fwd(images)
            hm, tg = BottomUpPose.split(pred)
            if flip_test:
                hm_f, _ = BottomUpPose.split(fwd(images[:, :, ::-1]))
                hm = 0.5 * (hm + flip_back(hm_f, pairs))
            out = decode_ae(hm, tg, max_people=max_people,
                            score_threshold=score_threshold,
                            tag_threshold=tag_threshold)
            stride = jnp.array([W / hm.shape[3], H / hm.shape[2]],
                               jnp.float32)
            out["coords"] = out["coords"] * stride
            return out

        self._step = jax.jit(infer)

    calibrate_int8 = staticmethod(HeatmapPredictor.calibrate_int8)

    def __call__(self, images):
        """images: (B, H, W, 3) uint8 frames. Returns dict of fixed-size
        arrays: coords (B, P, K, 2) input px, scores (B, P, K),
        person_scores (B, P), person_mask (B, P)."""
        return jax.device_get(self._step(self.state, jnp.asarray(images)))
