"""COCO keypoints top-down dataset.

The graded configs train/eval on COCO keypoints (BASELINE.json:7-10).
Parses a COCO-format annotation JSON directly (no pycocotools dep), builds
one sample per annotated person instance, and produces the top-down crop
parameters (center, scale with fixed aspect + 1.25 padding) that the
on-device affine-warp kernel consumes. Keypoint coords are returned both
in source pixels and heatmap pixels (post-crop), matching the contract of
tpupose.engine.trainer / evaluator.

The crop itself runs on device (ops/affine.py) — the host only decodes
JPEGs and ships uint8, per the TPU input-pipeline design (SURVEY.md §7).
"""

from __future__ import annotations

import json
import os

import numpy as np

from tpupose.utils.logging import printT, printW

COCO_NUM_KEYPOINTS = 17


class CocoTopDownDataset:
    def __init__(self, image_dir: str, ann_file: str, image_size=(256, 192),
                 heatmap_size=(64, 48), is_train: bool = True,
                 scale_factor: float = 0.25, rotation_factor: float = 30.0,
                 flip_prob: float = 0.5, min_keypoints: int = 1,
                 padding: float = 1.25, seed: int = 0):
        self.image_dir = image_dir
        self.image_size = tuple(image_size)   # (H, W)
        self.heatmap_size = tuple(heatmap_size)
        self.is_train = is_train
        self.scale_factor = scale_factor
        self.rotation_factor = rotation_factor
        self.flip_prob = flip_prob
        self.padding = padding
        self._rng = np.random.RandomState(seed)

        with open(ann_file) as f:
            coco = json.load(f)
        images = {im["id"]: im for im in coco["images"]}
        self.samples = []
        for ann in coco.get("annotations", []):
            if ann.get("num_keypoints", 0) < min_keypoints or ann.get("iscrowd", 0):
                continue
            im = images.get(ann["image_id"])
            if im is None:
                continue
            kpts = np.asarray(ann["keypoints"], np.float32).reshape(-1, 3)
            x, y, w, h = ann["bbox"]
            self.samples.append({
                "file_name": im["file_name"],
                "image_id": int(ann["image_id"]),
                "width": im["width"], "height": im["height"],
                "bbox": np.array([x, y, w, h], np.float32),
                "joints": kpts[:, :2].copy(),
                "visibility": kpts[:, 2].copy(),
                "area": float(ann.get("area", w * h)),
            })
        printT(f"COCO top-down: {len(self.samples)} person instances from {ann_file}")

    @classmethod
    def from_config(cls, cfg, split: str = "train"):
        d = cfg.data
        sub = "train2017" if split == "train" else "val2017"
        return cls(
            image_dir=os.path.join(d.root, sub),
            ann_file=os.path.join(d.root, "annotations",
                                  f"person_keypoints_{sub}.json"),
            image_size=tuple(d.image_size),
            heatmap_size=tuple(cfg.model.heatmap_size),
            is_train=(split == "train"),
            scale_factor=d.scale_factor, rotation_factor=d.rotation_factor,
            flip_prob=d.flip_prob, seed=cfg.train.seed,
        )

    def __len__(self):
        return len(self.samples)

    def _box_to_center_scale(self, bbox):
        """xywh box -> (center, scale) with the target aspect ratio and
        1.25 padding (the MSRA convention the BASELINE decode expects)."""
        H, W = self.image_size
        aspect = W / H
        x, y, w, h = bbox
        cx, cy = x + w / 2, y + h / 2
        if w > aspect * h:
            h = w / aspect
        else:
            w = h * aspect
        return (np.array([cx, cy], np.float32),
                np.array([w, h], np.float32) * self.padding)

    def _read_image(self, file_name):
        from PIL import Image

        path = os.path.join(self.image_dir, file_name)
        return np.asarray(Image.open(path).convert("RGB"), np.uint8)

    def __getitem__(self, idx: int) -> dict:
        from tpupose.ops.affine import get_affine_matrix  # for host-side joints

        s = self.samples[idx]
        H, W = self.image_size
        Hh, Wh = self.heatmap_size
        center, scale = self._box_to_center_scale(s["bbox"])
        joints_src = s["joints"].copy()
        vis = s["visibility"].copy()
        rot = 0.0
        if self.is_train:
            scale = scale * np.clip(
                1.0 + self._rng.randn() * self.scale_factor,
                1 - self.scale_factor, 1 + self.scale_factor)
            if self._rng.rand() < 0.6:
                rot = float(np.clip(self._rng.randn() * self.rotation_factor,
                                    -2 * self.rotation_factor,
                                    2 * self.rotation_factor))

        img = self._read_image(s["file_name"])
        flipped = False
        if self.is_train and self._rng.rand() < self.flip_prob:
            flipped = True
            img = img[:, ::-1].copy()
            joints_src[:, 0] = s["width"] - 1 - joints_src[:, 0]
            center[0] = s["width"] - 1 - center[0]
            from tpupose.engine.evaluator import COCO_FLIP_PAIRS

            for a, b in COCO_FLIP_PAIRS:
                joints_src[[a, b]] = joints_src[[b, a]]
                vis[[a, b]] = vis[[b, a]]

        # Source images vary in size, so the crop to the fixed (H, W) input
        # happens here on the host with the SAME dst->src matrix the device
        # ops use (PIL's AFFINE transform takes exactly that 2x3 form);
        # fixed-size batches then flow uint8 to the device. Batched
        # on-device warping (ops/affine.py) is used where sources are
        # uniform (bench/eval canvases).
        import jax.numpy as jnp
        from PIL import Image

        m = np.asarray(get_affine_matrix(jnp.asarray(center), jnp.asarray(scale),
                                         rot, self.image_size))
        crop = Image.fromarray(img).transform(
            (W, H), Image.AFFINE, tuple(m.reshape(-1)),
            resample=Image.BILINEAR)
        crop = np.asarray(crop, np.uint8)

        # joints into heatmap coords via the heatmap-resolution matrix
        m_hm = np.asarray(get_affine_matrix(jnp.asarray(center), jnp.asarray(scale),
                                            rot, (Hh, Wh)))
        minv = _invert_2x3(m_hm)
        joints_hm = (minv[:, :2] @ joints_src.T + minv[:, 2:3]).T
        # joints leaving the crop become invisible
        inside = ((joints_hm[:, 0] >= 0) & (joints_hm[:, 0] < Wh)
                  & (joints_hm[:, 1] >= 0) & (joints_hm[:, 1] < Hh))
        vis = np.where(inside, vis, 0.0)

        return {
            "image": crop,                      # (H, W, 3) uint8 crop
            "image_id": np.int64(s["image_id"]),
            "center": center, "scale": scale, "rotation": np.float32(rot),
            "joints": joints_hm.astype(np.float32),   # heatmap coords
            "joints_src": joints_src.astype(np.float32),
            "visibility": vis.astype(np.float32),
            "area": np.float32(s["area"]),
            "flipped": flipped,
        }


def _invert_2x3(m):
    A = m[:, :2]
    t = m[:, 2]
    Ai = np.linalg.inv(A)
    return np.concatenate([Ai, (-Ai @ t)[:, None]], axis=1).astype(np.float32)
