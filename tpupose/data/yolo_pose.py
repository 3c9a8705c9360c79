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
        label stores 2-dim keypoints (reference: HPE/dataset.py:30-33).
        Fast path: the native C++ parser (tpupose/native/io.cc)."""
        from tpupose.data.native_io import parse_yolo_label

        K = self.num_keypoints
        if not os.path.exists(path):
            return np.zeros((0, 5 + 3 * K), np.float32)
        rows = parse_yolo_label(path, 5 + 3 * K, max_rows=self.max_instances)
        if rows is not None:
            return rows
        # 2-dim keypoint format: parse and pad v=1
        rows = parse_yolo_label(path, 5 + 2 * K, max_rows=self.max_instances)
        if rows is None:
            return None  # wrong column count (check_file.py behavior)
        out = np.ones((rows.shape[0], 5 + 3 * K), np.float32)
        out[:, :5] = rows[:, :5]
        out[:, 5::3] = rows[:, 5::2]
        out[:, 6::3] = rows[:, 6::2]
        return out

    def __len__(self):
        return len(self.image_paths)

    def _read_image(self, path: str):
        H, W = self.image_size
        if path.lower().endswith((".jpg", ".jpeg")):
            # native libjpeg decode + DCT prescale + resize (io.cc);
            # transparently falls back to PIL inside native_io
            from tpupose.data.native_io import decode_jpeg_batch

            return decode_jpeg_batch([path], H, W, num_threads=1)[0]
        from PIL import Image

        img = Image.open(path).convert("RGB")
        return np.asarray(img.resize((W, H)), np.uint8)  # stretch resize

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
