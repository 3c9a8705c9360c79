"""Data sanity tools.

Capability parity with the reference's validators
(reference: HPE/checkdata.py:8-59 — render GT boxes/keypoints onto images;
HPE/check_file.py:1-98 — scan label files for wrong column counts with a
DRY_RUN-guarded delete mode; HPE/image_resize.py:1-42 — bulk offline
resize with a thread pool). Headless: renders to files, never cv2 windows.

Usage:
    python -m tpupose.cli.tools check-data  --images d/images --labels d/labels --out viz/ [--nkpts 4]
    python -m tpupose.cli.tools check-labels --labels d/labels --nkpts 4 [--delete] [--images d/images]
    python -m tpupose.cli.tools resize --images src/ --out dst/ --size 640 [--workers 8]
    python -m tpupose.cli.tools convert-coco --ann annotations.json --out labels/
"""

from __future__ import annotations

import argparse
import glob
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from tpupose.utils.logging import printS, printT, printW


def _label_path(label_dir, img_path):
    stem = os.path.splitext(os.path.basename(img_path))[0]
    return os.path.join(label_dir, stem + ".txt")


def check_data(images: str, labels: str, out: str, nkpts: int = 4, limit: int = 50):
    """Render GT boxes + keypoints onto images (checkdata.py analog)."""
    from PIL import Image

    from tpupose.cli.test import draw_detections

    os.makedirs(out, exist_ok=True)
    paths = sorted(p for e in ("*.jpg", "*.jpeg", "*.png")
                   for p in glob.glob(os.path.join(images, e)))[:limit]
    for p in paths:
        img = np.asarray(Image.open(p).convert("RGB"), np.uint8)
        H, W = img.shape[:2]
        lp = _label_path(labels, p)
        if not os.path.exists(lp):
            printW(f"{p}: no label file")
            continue
        rows = np.loadtxt(lp, ndmin=2, dtype=np.float32)
        if rows.size == 0:
            continue
        if rows.shape[1] < 5 + 3 * nkpts or (rows.shape[1] - 5) % 3 != 0:
            printW(f"{lp}: malformed ({rows.shape[1]} columns), skipping "
                   "(run check-labels)")
            continue
        kpts = rows[:, 5:].reshape(len(rows), -1, 3).copy()
        kpts[..., 0] *= W
        kpts[..., 1] *= H
        kpts[..., 2] = (kpts[..., 2] > 0).astype(np.float32)
        vis = np.ones(len(rows), bool)
        outimg = draw_detections(img, kpts, rows[:, 0], vis)
        # draw box corners as dots
        for r in rows:
            cx, cy, w, h = r[1] * W, r[2] * H, r[3] * W, r[4] * H
            for x, y in ((cx - w / 2, cy - h / 2), (cx + w / 2, cy + h / 2),
                         (cx - w / 2, cy + h / 2), (cx + w / 2, cy - h / 2)):
                xi, yi = int(np.clip(x, 0, W - 1)), int(np.clip(y, 0, H - 1))
                outimg[max(0, yi - 2):yi + 3, max(0, xi - 2):xi + 3] = (0, 0, 255)
        Image.fromarray(outimg).save(os.path.join(out, os.path.basename(p)))
    printS(f"rendered {len(paths)} images to {out}")


def check_labels(labels: str, nkpts: int, delete: bool = False,
                 images: str = ""):
    """Validate label column counts; optionally delete bad image/label
    pairs. delete=False is the DRY_RUN guard (check_file.py:17)."""
    expected = (5 + 3 * nkpts, 5 + 2 * nkpts)
    bad = []
    for lp in sorted(glob.glob(os.path.join(labels, "*.txt"))):
        with open(lp) as f:
            for ln, line in enumerate(f, 1):
                vals = line.split()
                if vals and len(vals) not in expected:
                    bad.append((lp, ln, len(vals)))
                    break
    for lp, ln, n in bad:
        printW(f"{lp}:{ln}: {n} columns (expected {expected})")
        if delete:
            os.remove(lp)
            if images:
                stem = os.path.splitext(os.path.basename(lp))[0]
                for e in (".jpg", ".jpeg", ".png"):
                    ip = os.path.join(images, stem + e)
                    if os.path.exists(ip):
                        os.remove(ip)
            printT(f"deleted {lp}")
    printS(f"{len(bad)} bad label files" + ("" if delete else " (dry run)"))
    return bad


def resize_images(images: str, out: str, size: int = 640, workers: int = 8):
    """Bulk offline resize with a thread pool (image_resize.py analog)."""
    from PIL import Image

    os.makedirs(out, exist_ok=True)
    paths = sorted(p for e in ("*.jpg", "*.jpeg", "*.png")
                   for p in glob.glob(os.path.join(images, e)))

    def work(p):
        img = Image.open(p).convert("RGB").resize((size, size))
        img.save(os.path.join(out, os.path.basename(p)))

    with ThreadPoolExecutor(max_workers=workers) as ex:
        list(ex.map(work, paths))
    printS(f"resized {len(paths)} images to {size}x{size} in {out}")


def convert_coco(ann: str, out: str, min_keypoints: int = 1):
    """COCO keypoints JSON -> YOLO-pose txt labels.

    Writes one `<image_stem>.txt` per annotated image with rows
    `cls cx cy w h (x y v)*K`, normalized to [0, 1] — exactly the format
    YoloPoseDataset parses (data/yolo_pose.py; reference HPE/dataset.py
    rows). Visibility keeps COCO semantics clamped to {0, 1, 2}. The
    reference repo's YOLO-format dataset was prepared by hand; this is
    the missing bridge from standard COCO annotations.
    """
    import json

    with open(ann) as f:
        data = json.load(f)
    os.makedirs(out, exist_ok=True)
    images = {im["id"]: im for im in data["images"]}
    rows_per_image: dict = {}
    skipped = 0
    for a in data.get("annotations", []):
        if a.get("iscrowd", 0) or "keypoints" not in a:
            skipped += 1
            continue
        kp = np.asarray(a["keypoints"], np.float32).reshape(-1, 3)
        if int((kp[:, 2] > 0).sum()) < min_keypoints:
            skipped += 1
            continue
        im = images[a["image_id"]]
        W0, H0 = float(im["width"]), float(im["height"])
        x, y, w, h = [float(v) for v in a["bbox"]]
        cls = int(a.get("category_id", 1)) - 1
        row = [cls, (x + w / 2) / W0, (y + h / 2) / H0, w / W0, h / H0]
        for px, py, pv in kp:
            row += [float(px) / W0, float(py) / H0,
                    float(np.clip(pv, 0, 2))]
        rows_per_image.setdefault(a["image_id"], []).append(row)
    n_rows = 0
    for iid, rows in rows_per_image.items():
        stem = os.path.splitext(images[iid]["file_name"])[0]
        with open(os.path.join(out, os.path.basename(stem) + ".txt"),
                  "w") as f:
            for r in rows:
                f.write(str(int(r[0])) + " "
                        + " ".join(f"{v:.6f}" for v in r[1:]) + "\n")
        n_rows += len(rows)
    printS(f"wrote {len(rows_per_image)} label files / {n_rows} instances "
           f"to {out} ({skipped} annotations skipped)")


def average_ckpts(cfg_path: str, ckpt_dir: str, out_dir: str,
                  last: int = 0, steps=None):
    """SWA checkpoint averaging: average the params/batch_stats of several
    periodic checkpoints of one run and save the result as a standalone
    checkpoint directory, loadable anywhere a normal checkpoint is
    (--ckpt, eval, serve, export)."""
    import jax
    import jax.numpy as jnp
    import optax

    from tpupose.configs.parser import load_config
    from tpupose.engine.builder import Builder
    from tpupose.engine.checkpoint import (CheckpointManager,
                                           average_checkpoints)
    from tpupose.engine.train_state import create_train_state

    cfg = load_config(cfg_path)
    model = Builder(cfg).model()
    H, W = cfg.data.image_size
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, H, W, 3), jnp.float32),
                               optax.sgd(0.0))
    avg, used = average_checkpoints(ckpt_dir, state, steps=steps, last=last)
    out = CheckpointManager(out_dir)
    try:
        out.save(int(avg.step), avg, force=True)
    finally:
        out.close()
    printS(f"averaged checkpoint ({len(used)} steps) saved to {out_dir}")


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    a = sub.add_parser("check-data")
    a.add_argument("--images", required=True)
    a.add_argument("--labels", required=True)
    a.add_argument("--out", required=True)
    a.add_argument("--nkpts", type=int, default=4)
    a.add_argument("--limit", type=int, default=50)
    b = sub.add_parser("check-labels")
    b.add_argument("--labels", required=True)
    b.add_argument("--nkpts", type=int, required=True)
    b.add_argument("--delete", action="store_true")
    b.add_argument("--images", default="")
    c = sub.add_parser("resize")
    c.add_argument("--images", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--size", type=int, default=640)
    c.add_argument("--workers", type=int, default=8)
    d = sub.add_parser("convert-coco")
    d.add_argument("--ann", required=True, help="COCO keypoints json")
    d.add_argument("--out", required=True, help="output labels dir")
    d.add_argument("--min-keypoints", type=int, default=1)
    e = sub.add_parser("average-ckpts")
    e.add_argument("--cfg", required=True, help="model config YAML")
    e.add_argument("--ckpt", required=True, help="checkpoint dir to average")
    e.add_argument("--out", required=True, help="output checkpoint dir")
    e.add_argument("--last", type=int, default=0,
                   help="average the newest N periodic steps (0 = all)")
    e.add_argument("--steps", type=int, nargs="*", default=None,
                   help="explicit step list (overrides --last)")
    args = p.parse_args(argv)
    if args.cmd == "check-data":
        check_data(args.images, args.labels, args.out, args.nkpts, args.limit)
    elif args.cmd == "check-labels":
        check_labels(args.labels, args.nkpts, args.delete, args.images)
    elif args.cmd == "convert-coco":
        convert_coco(args.ann, args.out, args.min_keypoints)
    elif args.cmd == "average-ckpts":
        average_ckpts(args.cfg, args.ckpt, args.out, args.last, args.steps)
    else:
        resize_images(args.images, args.out, args.size, args.workers)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
