"""Top-down evaluation pipeline: forward (+ flip-test) -> fused decode ->
back-projection to source coords -> metric accumulation.

This is the graded eval path (BASELINE.json:10: "HRNet-W48 384x288 eval
with flip-test averaging + DARK sub-pixel decode fused on TPU"): the whole
forward+flip+merge+decode compiles to one XLA program per batch; only the
tiny (B, K, 3) results come back to the host for metric accumulation.

The reference never wires its metric objects into the new trainer
(SURVEY.md §5.5); here the evaluator drives any metric from
tpupose/metrics via the update()/compute() API.
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


class TopDownEvaluator:
    def __init__(self, state, heatmap_size, decode: str = "dark",
                 flip_test: bool = True, flip_pairs=None,
                 blur_kernel: int = 11, sigma: float = 2.0):
        self.state = state
        self.heatmap_size = tuple(heatmap_size)
        self.flip_pairs = (np.asarray(flip_pairs) if flip_pairs is not None
                           else COCO_FLIP_PAIRS)
        self.decode = decode
        self.flip_test = flip_test
        self.blur_kernel = blur_kernel
        self.sigma = sigma
        self._step = jax.jit(partial(self._eval_step))

    def _eval_step(self, state, images, centers, scales):
        """One fused program: normalize -> forward (+flipped forward) ->
        merge -> decode -> transform to source coords."""
        from tpupose.ops.affine import get_affine_matrix, affine_transform_points
        from tpupose.ops.decode import decode_heatmaps, merge_flip
        from tpupose.ops.preprocess import normalize_images

        x = normalize_images(images)
        hm = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False)                                   # (B, Hh, Wh, K)
        hm = jnp.transpose(hm, (0, 3, 1, 2))                  # NKHW
        if self.flip_test:
            hm_f = state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                x[:, :, ::-1], train=False)
            hm_f = jnp.transpose(hm_f, (0, 3, 1, 2))
            pairs = self.flip_pairs if len(self.flip_pairs) else np.zeros((0, 2), np.int64)
            hm = merge_flip(hm, hm_f, pairs)
        coords, scores = decode_heatmaps(hm, self.decode, self.blur_kernel,
                                         self.sigma)

        def back(c, center, scale):
            m = get_affine_matrix(center, scale, 0.0, self.heatmap_size)
            return affine_transform_points(c, m)

        src = jax.vmap(back)(coords, centers, scales)
        return src, scores

    def run(self, loader, metrics: Sequence, gt_key: str = "joints_src"):
        """loader yields dicts with images/center/scale and GT in source
        coords. Updates each metric; returns their computed dicts merged."""
        for batch in loader:
            coords, scores = self._step(
                self.state, jnp.asarray(batch["images"]),
                jnp.asarray(batch["center"]), jnp.asarray(batch["scale"]))
            coords = np.asarray(coords)
            gt = np.asarray(batch[gt_key])
            vis = np.asarray(batch["visibility"])
            for m in metrics:
                m.update(coords, gt, vis)
        out = {}
        for m in metrics:
            out.update({k: v for k, v in m.compute().items()
                        if np.isscalar(v) or isinstance(v, float)})
        return out
