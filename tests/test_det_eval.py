"""Detection-box-driven COCO keypoint eval (engine/det_eval.py): the
official top-down protocol — crops come from a detector's COCO results
JSON, scored by OKS-AP greedy matching against the GT annotations (missed
persons and false positives flow into AP/AR, unlike GT-box eval).

Setup mirrors tests/test_oksap_pipeline.py: keypoint Gaussians painted
into the image channels + a pooling "model" make predictions GT-perfect
wherever a crop covers the person.
"""

import json
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpupose.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD

K = 3
IMG_SIZE = (256, 192)
HM_SIZE = (64, 48)


@pytest.fixture(scope="module")
def det_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("cocodet")
    (root / "val2017").mkdir()
    (root / "annotations").mkdir()
    rng = np.random.RandomState(1)
    images, anns, boxes = [], [], {}
    aid = 0
    for i in range(4):
        W0, H0 = 400, 480
        img = np.zeros((H0, W0, 3), np.float32)
        ys, xs = np.mgrid[0:H0, 0:W0].astype(np.float32)
        n_persons = 1 + (i % 2)
        boxes[i] = []
        for p in range(n_persons):
            x0, y0 = 40 + p * 190, 100
            w, h = 160, 280
            kp = []
            for k in range(K):
                kx = x0 + rng.uniform(0.3, 0.7) * w
                ky = y0 + rng.uniform(0.3, 0.7) * h
                kp += [float(kx), float(ky), 2]
                d2 = (xs - kx) ** 2 + (ys - ky) ** 2
                img[..., k] += np.exp(-d2 / (2 * 8.0 ** 2))
            anns.append({"id": aid, "image_id": i, "category_id": 1,
                         "bbox": [x0, y0, w, h], "keypoints": kp,
                         "num_keypoints": K, "area": float(w * h),
                         "iscrowd": 0})
            boxes[i].append([x0, y0, w, h])
            aid += 1
        name = f"{i:012d}.jpg"
        Image.fromarray((img / max(img.max(), 1e-6) * 255).astype(np.uint8)
                        ).save(root / "val2017" / name, quality=98)
        images.append({"id": i, "file_name": name, "width": W0,
                       "height": H0})
    with open(root / "annotations" / "person_keypoints_val2017.json",
              "w") as f:
        json.dump({"images": images, "annotations": anns}, f)
    return str(root), boxes


class PoolModel(nn.Module):
    """Un-normalize -> 4x avg-pool: heatmaps == painted GT Gaussians."""

    @nn.compact
    def __call__(self, x, train=False):
        gain = self.param("gain", nn.initializers.ones, ())
        m = jnp.asarray(IMAGENET_MEAN)
        s = jnp.asarray(IMAGENET_STD)
        x = x.astype(jnp.float32) * s + m
        return nn.avg_pool(x, (4, 4), strides=(4, 4)) * gain


def _evaluator():
    import optax

    from tpupose.engine.evaluator import TopDownEvaluator
    from tpupose.engine.train_state import create_train_state

    state = create_train_state(PoolModel(), jax.random.PRNGKey(0),
                               jnp.zeros((1, *IMG_SIZE, 3)), optax.sgd(0.0))
    return TopDownEvaluator(state, HM_SIZE, decode="dark", flip_test=False)


def _write_dets(path, entries):
    with open(path, "w") as f:
        json.dump(entries, f)


def _run(det_root, det_entries, results_path=None, **ds_kw):
    from tpupose.engine.det_eval import (DetectionCropDataset,
                                         evaluate_detections)

    root, _ = det_root
    det_file = os.path.join(root, "dets.json")
    _write_dets(det_file, det_entries)
    ds = DetectionCropDataset(
        image_dir=os.path.join(root, "val2017"),
        ann_file=os.path.join(root, "annotations",
                              "person_keypoints_val2017.json"),
        det_file=det_file, image_size=IMG_SIZE, heatmap_size=HM_SIZE,
        num_keypoints=K, **ds_kw)
    sig = np.full(K, 0.05, np.float32)
    return evaluate_detections(_evaluator(), ds, batch_size=4, sigmas=sig,
                               results_path=results_path), ds


def _gt_dets(boxes, jitter=0.0, rng=None):
    out = []
    for iid, bs in boxes.items():
        for b in bs:
            bb = list(b)
            if jitter:
                bb = [v + rng.uniform(-jitter, jitter) for v in bb]
            out.append({"image_id": iid, "category_id": 1, "bbox": bb,
                        "score": 0.9})
    return out


def test_det_eval_perfect_boxes(det_root):
    _, boxes = det_root
    out, ds = _run(det_root, _gt_dets(boxes))
    assert len(ds) == 6
    assert out["mAP"] > 0.95, out
    assert out["AR"] > 0.95, out


def test_det_eval_jittered_boxes(det_root):
    """Box noise must not break the pipeline: crops still cover the
    person (padding 1.25), so AP stays high."""
    _, boxes = det_root
    rng = np.random.RandomState(3)
    out, _ = _run(det_root, _gt_dets(boxes, jitter=12.0, rng=rng))
    assert out["mAP50"] > 0.9, out


def test_det_eval_missed_person(det_root):
    """Dropping one person's detection: that GT still counts (recall
    denominator), so AR and mAP fall below the perfect run."""
    _, boxes = det_root
    out_perfect, _ = _run(det_root, _gt_dets(boxes))
    out, _ = _run(det_root, _gt_dets(boxes)[:-1])   # drop one instance
    assert out["AR50"] < out_perfect["AR50"], (out, out_perfect)
    assert out["AR50"] <= 5.0 / 6.0 + 1e-6, out
    assert out["mAP"] < out_perfect["mAP"], (out, out_perfect)


def test_det_eval_false_positive_ranked_low(det_root):
    """An extra low-scoring background box ranks after all true
    detections: AP50 barely moves (precision dips only at full recall)."""
    _, boxes = det_root
    dets = _gt_dets(boxes)
    dets.append({"image_id": 0, "category_id": 1,
                 "bbox": [5.0, 5.0, 60.0, 90.0], "score": 0.05})
    out, ds = _run(det_root, dets)
    assert len(ds) == 7
    assert out["mAP50"] > 0.9, out


def test_det_eval_threshold_and_results(det_root, tmp_path):
    """score_threshold filters detections; the results JSON carries one
    entry per surviving detection with det-score-weighted instance
    scores."""
    _, boxes = det_root
    dets = _gt_dets(boxes)
    dets.append({"image_id": 1, "category_id": 1,
                 "bbox": [5.0, 5.0, 60.0, 90.0], "score": 0.01})
    path = str(tmp_path / "det_results.json")
    out, ds = _run(det_root, dets, results_path=path,
                   score_threshold=0.5)
    assert len(ds) == 6                  # the 0.01 box is filtered
    with open(path) as f:
        res = json.load(f)
    assert len(res) == 6
    for r in res:
        assert len(r["keypoints"]) == 3 * K
        assert r["category_id"] == 1


@pytest.mark.slow
def test_det_eval_trainer_wiring(det_root, tmp_path, monkeypatch):
    """cfg.eval.det_boxes drives Trainer.evaluate -> det_* metrics."""
    from tpupose.configs import default_config
    from tpupose.engine.trainer import Trainer

    root, boxes = det_root
    det_file = os.path.join(root, "dets_t.json")
    _write_dets(det_file, _gt_dets(boxes))
    # Trainer builds a train split too: alias val as train
    if not os.path.exists(os.path.join(root, "train2017")):
        os.symlink(os.path.join(root, "val2017"),
                   os.path.join(root, "train2017"))
        import shutil

        shutil.copy(
            os.path.join(root, "annotations",
                         "person_keypoints_val2017.json"),
            os.path.join(root, "annotations",
                         "person_keypoints_train2017.json"))

    cfg = default_config()
    cfg.model.name = "simple_baseline"
    cfg.model.backbone = "resnet18"
    cfg.model.num_keypoints = K
    cfg.model.heatmap_size = HM_SIZE
    cfg.data.name = "coco"
    cfg.data.root = root
    cfg.data.image_size = IMG_SIZE
    cfg.train.batch_size = 8   # the 8-device test mesh shards the batch
    cfg.eval.batch_size = 8
    cfg.eval.det_boxes = det_file
    cfg.eval.flip_test = False
    cfg.train.output_dir = str(tmp_path / "out")
    cfg.train.tensorboard = False
    trainer = Trainer(cfg)
    out = trainer.evaluate_detections(det_file)
    # random weights -> tiny AP, but the full wiring must produce the
    # det_* suite without error
    assert "det_mAP" in out and "det_AR" in out
    assert 0.0 <= out["det_mAP"] <= 1.0 or out["det_mAP"] == -1.0
