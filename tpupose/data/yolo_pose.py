"""YOLO-pose on-disk dataset: images/ + labels/ txt pairs.

Capability parity with YoloPoseDataset (reference: HPE/dataset.py:7-86,
pose/pose/data/datasets/yolo_pose.py:8-87): globs jpg/png, pre-parses all
label files into RAM at init, pads 2-dim keypoints with v=1, stretch-resizes
to a square, and feeds uint8 (normalization deferred to device).

TPU-native difference (SURVEY.md §7 "hard parts"): the reference collates
variable-length targets by concatenation with a batch-index column
(HPE/dataset.py:75-86) — a dynamic shape. Here every sample is padded to
`max_instances` rows with a boolean mask, so batches are static-shape and
the loss does masked math instead of ragged indexing.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from tpupose.utils.logging import printW


class YoloPoseDataset:
    def __init__(self, image_dir: str, label_dir: str, image_size=(640, 640),
                 num_keypoints: int = 4, max_instances: int = 32):
        self.image_size = image_size
        self.num_keypoints = num_keypoints
        self.max_instances = max_instances
        exts = ("*.jpg", "*.jpeg", "*.png")
        self.image_paths = sorted(
            p for ext in exts for p in glob.glob(os.path.join(image_dir, ext))
        )
        # pre-parse every label txt into RAM (reference: HPE/dataset.py:19-40)
        self.labels = []
        kept = []
        for p in self.image_paths:
            stem = os.path.splitext(os.path.basename(p))[0]
            lp = os.path.join(label_dir, stem + ".txt")
            rows = self._parse_label(lp)
            if rows is None:
                printW(f"skipping {p}: bad/missing label")
                continue
            kept.append(p)
            self.labels.append(rows)
        self.image_paths = kept

    def _parse_label(self, path: str):
        """Rows: cls cx cy w h (x y [v])*K, normalized. Pads v=1 when the
        label stores 2-dim keypoints (reference: HPE/dataset.py:30-33)."""
        K = self.num_keypoints
        if not os.path.exists(path):
            return np.zeros((0, 5 + 3 * K), np.float32)
        rows = []
        with open(path) as f:
            for ln in f:
                vals = [float(v) for v in ln.split()]
                if not vals:
                    continue
                if len(vals) == 5 + 3 * K:
                    rows.append(vals)
                elif len(vals) == 5 + 2 * K:
                    out = vals[:5]
                    for k in range(K):
                        out += [vals[5 + 2 * k], vals[6 + 2 * k], 1.0]
                    rows.append(out)
                else:
                    return None  # wrong column count (check_file.py behavior)
        return np.asarray(rows, np.float32).reshape(-1, 5 + 3 * K)

    def __len__(self):
        return len(self.image_paths)

    def _read_image(self, path: str):
        try:
            from PIL import Image

            img = Image.open(path).convert("RGB")
            H, W = self.image_size
            img = img.resize((W, H))  # stretch resize (HPE/dataset.py:61-65)
            return np.asarray(img, np.uint8)
        except ImportError:
            import cv2

            img = cv2.imread(path)
            img = cv2.resize(img, (self.image_size[1], self.image_size[0]))
            return img[..., ::-1].copy()  # BGR -> RGB

    def __getitem__(self, idx: int) -> dict:
        K, M = self.num_keypoints, self.max_instances
        rows = self.labels[idx][:M]
        n = rows.shape[0]
        boxes = np.zeros((M, 4), np.float32)
        cls = np.zeros((M,), np.int32)
        kpts = np.zeros((M, K, 3), np.float32)
        mask = np.zeros((M,), bool)
        if n:
            cls[:n] = rows[:, 0].astype(np.int32)
            boxes[:n] = rows[:, 1:5]
            kpts[:n] = rows[:, 5:].reshape(n, K, 3)
            mask[:n] = True
        return {
            "image": self._read_image(self.image_paths[idx]),
            "boxes": boxes, "classes": cls, "keypoints": kpts,
            "instance_mask": mask,
        }
