"""MPII top-down dataset: parse conventions, crop/label math, flip pairs,
builder + trainer wiring (reference names MPII in
HPE/configs/method/deep_pose.yaml but never shipped a loader)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from tpupose.data.mpii import MPII_FLIP_PAIRS, MpiiTopDownDataset

W0, H0 = 120, 100  # source image dims


def _write_mpii(root, n=3, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "annot"), exist_ok=True)
    anns = []
    for i in range(n):
        name = f"img_{i}.jpg"
        arr = rng.randint(0, 255, (H0, W0, 3)).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(root, "images", name),
                                  quality=92)
        joints = np.stack([rng.uniform(30, 90, 16),
                           rng.uniform(20, 80, 16)], axis=1)
        anns.append({
            "image": name,
            "center": [61.0, 51.0],          # 1-based (matlab)
            "scale": 0.4,                     # 80 px person box
            "joints": joints.tolist(),
            "joints_vis": [1] * 14 + [0, 1],
        })
    for split in ("train", "valid"):
        with open(os.path.join(root, "annot", f"{split}.json"), "w") as f:
            json.dump(anns, f)
    _write_mpii.last_anns = anns
    return anns


def test_parse_conventions(tmp_path):
    _write_mpii(str(tmp_path))
    ds = MpiiTopDownDataset(
        image_dir=str(tmp_path / "images"),
        ann_file=str(tmp_path / "annot" / "valid.json"),
        image_size=(64, 64), heatmap_size=(16, 16), is_train=False)
    assert len(ds) == 3
    s = ds.samples[0]
    # center - 1 (0-based), then +15*scale on y, scale *= 1.25
    assert s["center0"][0] == pytest.approx(60.0)
    assert s["center0"][1] == pytest.approx(50.0 + 15 * 0.4)
    assert float(s["scale0"]) == pytest.approx(0.4 * 1.25)
    # joints are 1-based in the json too
    raw = np.asarray(_write_mpii.last_anns[0]["joints"], np.float32)
    np.testing.assert_allclose(s["joints"], raw - 1.0, atol=1e-5)
    # pixel box: scale*200 square, aspect 1 — NO extra padding (the MSRA
    # *1.25 above is the only loosening)
    c, sc = ds._center_scale(s)
    assert sc[0] == pytest.approx(0.4 * 1.25 * 200)
    assert sc[0] == pytest.approx(sc[1])


def test_getitem_labels_match_affine(tmp_path):
    _write_mpii(str(tmp_path))
    ds = MpiiTopDownDataset(
        image_dir=str(tmp_path / "images"),
        ann_file=str(tmp_path / "annot" / "valid.json"),
        image_size=(64, 64), heatmap_size=(16, 16), is_train=False)
    d = ds[1]
    assert d["image"].shape == (64, 64, 3) and d["image"].dtype == np.uint8
    assert d["joints"].shape == (16, 2) and d["visibility"].shape == (16,)
    # heatmap-coord joints == inverse crop matrix applied to source joints
    from tpupose.ops.affine import get_affine_matrix_np

    m = get_affine_matrix_np(d["center"], d["scale"], 0.0, (16, 16))
    A, t = m[:, :2], m[:, 2]
    inv = np.linalg.inv(A)
    expect = (inv @ (d["joints_src"].T - t[:, None])).T
    np.testing.assert_allclose(d["joints"], expect, atol=1e-4)
    # the joint marked invisible in the json stays invisible
    assert d["visibility"][14] == 0.0


def test_flip_uses_mpii_pairs(tmp_path):
    _write_mpii(str(tmp_path))
    ds = MpiiTopDownDataset(
        image_dir=str(tmp_path / "images"),
        ann_file=str(tmp_path / "annot" / "train.json"),
        image_size=(64, 64), heatmap_size=(16, 16), is_train=True,
        scale_factor=0.0, rotation_factor=0.0, flip_prob=1.0, seed=3)
    base = ds.samples[0]
    _, center, _, rot, flipped, joints_src, vis = ds._sample_params(0)
    assert flipped and rot == 0.0
    # x mirrored then MPII left/right channels swapped
    mirrored = base["joints"].copy()
    mirrored[:, 0] = base["width"] - 1 - mirrored[:, 0]
    for a, b in MPII_FLIP_PAIRS:
        mirrored[[a, b]] = mirrored[[b, a]]
    np.testing.assert_allclose(joints_src, mirrored, atol=1e-5)
    assert center[0] == pytest.approx(base["width"] - 1 - base["center0"][0])
    # the swapped visibility moved with its joint (14<->11 not a pair; the
    # invisible joint 14 pairs with 11 in [11,14])
    assert vis[11] == 0.0 and vis[14] == 1.0


def test_batch_and_builder_wiring(tmp_path):
    _write_mpii(str(tmp_path))
    from tpupose.configs.default import Config
    from tpupose.engine.builder import Builder

    cfg = Config()
    cfg.data.name = "mpii"
    cfg.data.root = str(tmp_path)
    cfg.data.image_size = [64, 64]
    cfg.model.name = "simple_baseline"
    cfg.model.backbone = "resnet18"
    cfg.model.num_keypoints = 16
    cfg.model.heatmap_size = [16, 16]
    cfg.train.batch_size = 2
    cfg.train.mixed_precision = False
    b = Builder(cfg)
    ds = b.dataset("valid")
    assert isinstance(ds, MpiiTopDownDataset)
    loader = b.dataloader(ds, "valid")
    batch = next(iter(loader))
    assert batch["images"].shape[1:] == (64, 64, 3)
    assert batch["joints"].shape[1:] == (16, 2)
    assert "joints_src" in batch and "center" in batch


@pytest.mark.slow
def test_trainer_evaluator_gets_mpii_flip_pairs(tmp_path):
    _write_mpii(str(tmp_path))
    from tpupose.configs.default import Config
    from tpupose.engine.trainer import Trainer

    cfg = Config()
    cfg.data.name = "mpii"
    cfg.data.root = str(tmp_path)
    cfg.data.image_size = [64, 64]
    cfg.model.name = "simple_baseline"
    cfg.model.backbone = "resnet18"
    cfg.model.num_keypoints = 16
    cfg.model.heatmap_size = [16, 16]
    cfg.train.batch_size = 2
    cfg.train.mixed_precision = False
    cfg.train.output_dir = str(tmp_path / "out")
    cfg.eval.metrics = ("pckh", "mpjpe")
    tr = Trainer(cfg)
    ev = tr._get_evaluator()
    np.testing.assert_array_equal(ev.flip_pairs, MPII_FLIP_PAIRS)
    # PCKh metric object built from config (MPII head pair 9-8 default)
    ms = tr._build_eval_metrics()
    from tpupose.metrics.pckh import PCKh

    assert any(isinstance(m, PCKh) for m in ms)
