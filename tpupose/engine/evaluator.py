"""Top-down evaluation pipeline: forward (+ flip-test) -> fused decode ->
back-projection to source coords -> metric accumulation.

This is the graded eval path (BASELINE.json:10: "HRNet-W48 384x288 eval
with flip-test averaging + DARK sub-pixel decode fused on TPU"): the whole
forward+flip+merge+decode compiles to one XLA program per batch; only the
tiny (B, K, 3) results come back to the host for metric accumulation.

The reference never wires its metric objects into the new trainer
(SURVEY.md §5.5); here the evaluator drives any metric from
tpupose/metrics via the update()/compute() API — including OKSAP, the
COCO keypoint mAP (reference: HPE/core/metric/oksap.py:135-358): per-crop
predictions are regrouped by source image id so multi-person images get
proper greedy matching, each instance scored by its mean keypoint
confidence.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

# COCO-17 left/right keypoint pairs for flip-test
COCO_FLIP_PAIRS = np.array([
    (1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12), (13, 14), (15, 16)
])


def visible_bbox_area(gt, vis):
    """Fallback OKS area when the dataset carries no annotation area:
    visible-joint bounding-box area. gt (B, K, 2), vis (B, K) -> (B,)."""
    v = vis > 0
    big = 1e9
    x = np.where(v, gt[..., 0], big)
    y = np.where(v, gt[..., 1], big)
    xmin, ymin = x.min(-1), y.min(-1)
    x = np.where(v, gt[..., 0], -big)
    y = np.where(v, gt[..., 1], -big)
    xmax, ymax = x.max(-1), y.max(-1)
    w = np.maximum(xmax - xmin, 1.0)
    h = np.maximum(ymax - ymin, 1.0)
    return np.where(v.any(-1), w * h, 1.0).astype(np.float32)


class TopDownEvaluator:
    def __init__(self, state, heatmap_size, decode: str = "dark",
                 flip_test: bool = True, flip_pairs=None,
                 blur_kernel: int = 11, sigma: float = 2.0,
                 shard_fn=None, quant_scales=None, family: str = "heatmap",
                 udp: bool = False, int8_engine=None):
        """shard_fn (optional): host batch pytree -> mesh-sharded arrays
        (e.g. MeshManager.shard_batch). With it, eval batches are sharded
        over the mesh 'data' axis so metric evaluation runs data-parallel
        across all chips (GSPMD parallelizes the jitted program from the
        input shardings); without it, inputs land on the default device.

        quant_scales (optional): {conv_path: amax} from ops.quant.calibrate
        — compiles the forward with int8 convolutions (per-channel int8
        weights, calibrated per-tensor activations); decode/flip/merge stay
        fp32/bf16.

        udp: unbiased (unit-length) coordinate processing — the dataset
        must have been built with the same flag (data.udp); back-projection
        uses the (N-1)-interval grid and the flip-test mirror needs no
        1-px shift (exact under this convention)."""
        self.state = state
        self.heatmap_size = tuple(heatmap_size)
        self.flip_pairs = (np.asarray(flip_pairs) if flip_pairs is not None
                           else COCO_FLIP_PAIRS)
        self.decode = decode
        self.flip_test = flip_test
        self.blur_kernel = blur_kernel
        self.sigma = sigma
        self.shard_fn = shard_fn
        self.quant_scales = dict(quant_scales) if quant_scales else None
        self.udp = udp
        # int8_engine (optional): an ops.int8_engine.Int8Engine built from
        # this state — replaces normalize+forward with the fused
        # int8-activation graph (uint8 in, fp32 heatmaps out); flip/merge/
        # decode/back-projection are unchanged. Stronger than quant_scales:
        # inter-layer activations are stored int8, halving HBM traffic.
        self.int8_engine = int8_engine
        # family: "heatmap" (2D maps + DARK/offset decode) or "simcc"
        # (1D bin classification, models/simcc.py; heatmap_size = bin grid)
        self.family = family
        step = (self._simcc_eval_step if family == "simcc"
                else self._eval_step)
        if int8_engine is not None:
            if family != "heatmap":
                raise ValueError(
                    f"int8_engine serves the heatmap family only "
                    f"(got family={family!r})")
            # the engine's quantized weights ride the jit as an ARGUMENT
            # (runtime buffers), not a closure constant — closing over
            # them would bake every weight into the executable (held
            # twice in HBM, constant-folded on every compile)
            jitted = jax.jit(partial(step))
            self._step = lambda state, images, centers, scales: jitted(
                state, images, centers, scales, self.int8_engine._qw)
        else:
            self._step = jax.jit(partial(step))

    def _apply(self, state, x):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        if self.quant_scales is not None:
            from tpupose.ops.quant import quantized_apply

            return quantized_apply(state.apply_fn, variables, self.quant_scales,
                                   x, train=False)
        return state.apply_fn(variables, x, train=False)

    def _eval_step(self, state, images, centers, scales, engine_qw=None):
        """One fused program: normalize -> forward (+flipped forward) ->
        merge -> decode -> transform to source coords. engine_qw: the
        int8 engine's quantized-weight pytree, passed through the jit
        boundary as an argument (see __init__)."""
        from tpupose.ops.affine import get_affine_matrix, affine_transform_points
        from tpupose.ops.decode import decode_heatmaps, merge_flip
        from tpupose.ops.preprocess import normalize_images

        if self.int8_engine is not None:
            # normalize is folded into the engine's first conv; flipping
            # raw uint8 pixels == flipping normalized pixels
            fwd = lambda im: self.int8_engine.forward_traceable(im, engine_qw)
            hm = fwd(images)
            x = images
        else:
            x = normalize_images(images)
            fwd = lambda xx: self._apply(state, xx)
            hm = fwd(x)                                       # (B, Hh, Wh, K)
        hm = jnp.transpose(hm, (0, 3, 1, 2))                  # NKHW
        if self.flip_test:
            hm_f = fwd(x[:, :, ::-1])
            hm_f = jnp.transpose(hm_f, (0, 3, 1, 2))
            pairs = self.flip_pairs if len(self.flip_pairs) else np.zeros((0, 2), np.int64)
            hm = merge_flip(hm, hm_f, pairs, shift=not self.udp)
        coords, scores = decode_heatmaps(hm, self.decode, self.blur_kernel,
                                         self.sigma)

        def back(c, center, scale):
            m = get_affine_matrix(center, scale, 0.0, self.heatmap_size,
                                  udp=self.udp)
            return affine_transform_points(c, m)

        src = jax.vmap(back)(coords, centers, scales)
        return src, scores

    def _simcc_eval_step(self, state, images, centers, scales):
        """SimCC twin of _eval_step (family simcc, models/simcc.py): one
        fused program of normalize -> forward (+flipped) -> softmax-merge
        -> argmax + parabolic sub-bin decode -> source coords. The bin grid
        (Hb, Wb) = self.heatmap_size plays the heatmap grid's role in the
        affine back-projection."""
        from tpupose.ops.affine import (affine_transform_points,
                                        get_affine_matrix)
        from tpupose.ops.decode import decode_simcc, simcc_flip_back
        from tpupose.ops.preprocess import normalize_images

        x = normalize_images(images)
        xl, yl = self._apply(state, x)
        if self.flip_test:
            xlf, ylf = self._apply(state, x[:, :, ::-1])
            pairs = (self.flip_pairs if len(self.flip_pairs)
                     else np.zeros((0, 2), np.int64))
            # split_ratio from the static shapes: Wb / crop W. Under udp
            # (u = p*(Wb-1)/(W-1)) the plain bin-axis reversal is the
            # exact mirror, so no shift; classic convention needs r-1.
            r = xl.shape[-1] / images.shape[2]
            shift = 0 if self.udp else int(round(r)) - 1
            xlb, ylb = simcc_flip_back(xlf, ylf, pairs, shift_bins=shift)
            # average PROBABILITIES (softmax is inside decode; averaging
            # logits would geometric-mean the distributions instead)
            xl = jnp.log(0.5 * jax.nn.softmax(xl.astype(jnp.float32), -1)
                         + 0.5 * jax.nn.softmax(xlb.astype(jnp.float32), -1)
                         + 1e-12)
            yl = jnp.log(0.5 * jax.nn.softmax(yl.astype(jnp.float32), -1)
                         + 0.5 * jax.nn.softmax(ylb.astype(jnp.float32), -1)
                         + 1e-12)
        coords, scores = decode_simcc(xl, yl)

        def back(c, center, scale):
            m = get_affine_matrix(center, scale, 0.0, self.heatmap_size,
                                  udp=self.udp)
            return affine_transform_points(c, m)

        src = jax.vmap(back)(coords, centers, scales)
        return src, scores

    def step(self, images, centers, scales):
        """Run the fused eval program on one batch (uses self.state)."""
        if self.shard_fn is not None:
            placed = self.shard_fn({"images": images, "centers": centers,
                                    "scales": scales})
            return self._step(self.state, placed["images"],
                              placed["centers"], placed["scales"])
        return self._step(self.state, jnp.asarray(images),
                          jnp.asarray(centers), jnp.asarray(scales))

    def run(self, loader, metrics: Sequence, gt_key: str = "joints_src",
            results_path: str | None = None):
        """Drive all metrics over a loader.

        loader yields dicts with images/center/scale, GT joints in source
        coords under `gt_key`, visibility, and optionally `area`,
        `image_id`, and a `pad_mask` marking padded tail rows (dropped
        here). Coordinate metrics (PCK/PCKh/PDJ/PCP/MPJPE) get
        update(coords, gt, vis); OKSAP gets per-source-image groups of
        (pred, score, gt, vis, area). Returns the merged scalar results.

        results_path: also dump every prediction in the standard COCO
        keypoint-results JSON format ([{image_id, category_id, keypoints
        [x,y,s]*K, score}]) — directly scoreable by pycocotools
        (COCOeval 'keypoints') or re-loadable for offline analysis. The
        instance score is the mean keypoint confidence, matching the
        OKSAP scoring above.
        """
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        from tpupose.metrics.oks_ap import OKSAP

        coord_metrics = [m for m in metrics if not isinstance(m, OKSAP)]
        ap_metrics = [m for m in metrics if isinstance(m, OKSAP)]
        groups: dict = {}
        results: list = []
        next_id = 0

        def accumulate(fut, batch):
            nonlocal next_id
            coords, scores = fut.result()
            keep = np.asarray(batch["pad_mask"]).astype(bool) \
                if "pad_mask" in batch else np.ones(len(coords), bool)
            coords, scores = coords[keep], scores[keep]
            gt = np.asarray(batch[gt_key])[keep]
            vis = np.asarray(batch["visibility"])[keep]
            if results_path is not None:
                ids = (np.asarray(batch["image_id"]).reshape(-1)[keep]
                       if "image_id" in batch
                       else np.full(len(coords), -1))
                kps = np.concatenate(
                    [coords, np.asarray(scores)[..., None]], axis=-1)
                for i in range(len(coords)):
                    results.append({
                        "image_id": int(ids[i]),
                        "category_id": 1,
                        "keypoints": [round(float(v), 3)
                                      for v in kps[i].reshape(-1)],
                        "score": round(float(scores[i].mean()), 5),
                    })
            for m in coord_metrics:
                m.update(coords, gt, vis)
            if ap_metrics:
                area = (np.asarray(batch["area"], np.float32)[keep]
                        if "area" in batch else visible_bbox_area(gt, vis))
                if "image_id" in batch:
                    ids = np.asarray(batch["image_id"]).reshape(-1)[keep]
                else:
                    ids = np.arange(next_id, next_id + len(coords))
                    next_id += len(coords)
                inst_score = scores.mean(axis=-1)  # mean kpt confidence
                for i, iid in enumerate(ids):
                    groups.setdefault(int(iid), []).append(
                        (coords[i], inst_score[i], gt[i], vis[i], area[i]))

        # Software-pipelined: each batch's eval program is dispatched (and
        # its small (B, K, ·) result fetch started on a thread) before the
        # previous batch's results are consumed, so device compute, result
        # round trips, and host metric accumulation overlap. Accumulation
        # order is preserved (the queue drains FIFO).
        pool = ThreadPoolExecutor(max_workers=2)
        inflight: deque = deque()
        try:
            for batch in loader:
                out = self.step(batch["images"], batch["center"],
                                batch["scale"])
                inflight.append((pool.submit(jax.device_get, out), batch))
                while len(inflight) > 2:
                    accumulate(*inflight.popleft())
            while inflight:
                accumulate(*inflight.popleft())
        finally:
            pool.shutdown(wait=False)
        for items in groups.values():
            pk = np.stack([it[0] for it in items])
            ps = np.asarray([it[1] for it in items], np.float32)
            gk = np.stack([it[2] for it in items])
            gv = np.stack([it[3] for it in items])
            ga = np.asarray([it[4] for it in items], np.float32)
            for m in ap_metrics:
                # top-down preds come from known person crops: the
                # detection's own area IS the crop area (drives AP_M/AP_L)
                m.update(pk, ps, gk, gv, ga, pred_area=ga)
        if results_path is not None:
            import json
            import os

            d = os.path.dirname(results_path)
            if d:
                os.makedirs(d, exist_ok=True)
            with open(results_path, "w") as f:
                json.dump(results, f)
        out = {}
        for m in metrics:
            out.update({k: float(v) for k, v in m.compute().items()
                        if np.isscalar(v) or isinstance(v, float)})
        return out
