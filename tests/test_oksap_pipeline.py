"""End-to-end COCO keypoint mAP (VERDICT r1 item #1): a synthetic
COCO-format val set flows through CocoTopDownDataset -> BatchLoader ->
TopDownEvaluator.run -> OKSAP, with a "model" whose heatmaps are
ground-truth-perfect (the keypoint Gaussians are painted into the image
channels and the model is a 4x average-pool). mAP must be ~1.0; a
systematically shifted model must score mAP50 > mAP75."""

import json
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpupose.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD

K = 3                      # one keypoint per image channel
IMG_SIZE = (256, 192)      # (H, W)
HM_SIZE = (64, 48)


@pytest.fixture(scope="module")
def coco_val_root(tmp_path_factory):
    """4 images, 1-2 persons each, keypoint Gaussians painted per channel."""
    from PIL import Image

    root = tmp_path_factory.mktemp("cocoval")
    (root / "val2017").mkdir()
    (root / "annotations").mkdir()
    rng = np.random.RandomState(0)
    images, anns = [], []
    aid = 0
    for i in range(4):
        W0, H0 = 400, 480
        img = np.zeros((H0, W0, 3), np.float32)
        ys, xs = np.mgrid[0:H0, 0:W0].astype(np.float32)
        n_persons = 1 + (i % 2)
        for p in range(n_persons):
            x0 = 40 + p * 190
            y0 = 100
            w, h = 160, 280
            kp = []
            for k in range(K):
                kx = x0 + rng.uniform(0.25, 0.75) * w
                ky = y0 + rng.uniform(0.25, 0.75) * h
                kp += [float(kx), float(ky), 2]
                d2 = (xs - kx) ** 2 + (ys - ky) ** 2
                img[..., k] += np.exp(-d2 / (2 * 8.0 ** 2))
            anns.append({"id": aid, "image_id": i, "category_id": 1,
                         "bbox": [x0, y0, w, h], "keypoints": kp,
                         "num_keypoints": K, "area": w * h, "iscrowd": 0})
            aid += 1
        name = f"{i:012d}.jpg"
        arr = np.clip(img * 255.0, 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "val2017" / name, quality=98)
        images.append({"id": i, "file_name": name, "width": W0, "height": H0})
    with open(root / "annotations" / "person_keypoints_val2017.json", "w") as f:
        json.dump({"images": images, "annotations": anns}, f)
    return str(root)


class PoolModel(nn.Module):
    """'Perfect model': undo ImageNet normalization, 4x avg-pool each
    channel -> heatmaps whose peaks sit exactly at the GT keypoints."""

    shift: int = 0   # optional systematic shift in heatmap pixels

    @nn.compact
    def __call__(self, x, train: bool = False):
        gain = self.param("gain", nn.initializers.ones, ())
        m = jnp.asarray(IMAGENET_MEAN)
        s = jnp.asarray(IMAGENET_STD)
        x = x.astype(jnp.float32) * s + m
        hm = nn.avg_pool(x, (4, 4), strides=(4, 4)) * 16.0 * gain
        if self.shift:
            hm = jnp.roll(hm, self.shift, axis=2)
        return hm


def _make_state(model):
    import optax

    from tpupose.engine.train_state import create_train_state

    return create_train_state(model, jax.random.PRNGKey(0),
                              jnp.zeros((1, *IMG_SIZE, 3)), optax.sgd(0.0))


def _run_eval(coco_val_root, shift=0, results_path=None):
    from tpupose.data.coco import CocoTopDownDataset
    from tpupose.data.loader import BatchLoader
    from tpupose.engine.evaluator import TopDownEvaluator
    from tpupose.metrics.oks_ap import OKSAP
    from tpupose.metrics.pck import PCK

    ds = CocoTopDownDataset(
        image_dir=os.path.join(coco_val_root, "val2017"),
        ann_file=os.path.join(coco_val_root, "annotations",
                              "person_keypoints_val2017.json"),
        image_size=IMG_SIZE, heatmap_size=HM_SIZE, is_train=False)
    assert len(ds) == 6  # 4 images, 1-2 persons each
    # batch 4 over 6 samples: exercises the padded static tail batch
    loader = BatchLoader(ds, batch_size=4, shuffle=False, drop_last=False,
                         pad_last=True)
    state = _make_state(PoolModel(shift=shift))
    ev = TopDownEvaluator(state, HM_SIZE, decode="dark", flip_test=False)
    # explicit sigmas: the 3-keypoint default would borrow the (very tight)
    # first three COCO-17 sigmas
    sigmas = np.full(K, 0.05, np.float32)
    return ev.run(loader, [OKSAP(num_classes=1, sigmas=sigmas),
                           PCK(alpha=0.2)], results_path=results_path)


def test_oksap_end_to_end_perfect(coco_val_root):
    out = _run_eval(coco_val_root)
    assert out["mAP"] > 0.95, out
    assert out["mAP50"] > 0.99, out
    assert out["pck"] > 0.99, out


def test_results_json_dump(coco_val_root, tmp_path):
    """results_path writes the standard COCO keypoint-results format:
    one entry per person instance, [x, y, score]*K keypoints in SOURCE
    pixels, image_ids matching the annotation file, instance score =
    mean keypoint confidence — directly consumable by pycocotools."""
    path = str(tmp_path / "sub" / "results.json")
    out = _run_eval(coco_val_root, results_path=path)
    assert out["mAP"] > 0.95
    with open(path) as f:
        res = json.load(f)
    with open(os.path.join(coco_val_root, "annotations",
                           "person_keypoints_val2017.json")) as f:
        ann = json.load(f)
    assert len(res) == len(ann["annotations"]) == 6
    valid_ids = {im["id"] for im in ann["images"]}
    by_img = {}
    for r in res:
        assert r["category_id"] == 1
        assert r["image_id"] in valid_ids
        assert len(r["keypoints"]) == 3 * K
        # (no [0,1] bound: MSE-trained heatmap peaks aren't probabilities,
        # and this synthetic model's peaks are painted image values)
        kp = np.asarray(r["keypoints"], np.float32).reshape(K, 3)
        assert abs(r["score"] - kp[:, 2].mean()) < 1e-3
        by_img.setdefault(r["image_id"], []).append(kp)
    # GT-perfect model: every predicted keypoint lands within ~2 source px
    # of the same-index GT keypoint of SOME instance in its image (a crop
    # can lock onto a neighbor's stronger painted peak per channel, which
    # OKS-AP's greedy matching tolerates the same way)
    gt_by_img = {}
    for a in ann["annotations"]:
        g = np.asarray(a["keypoints"], np.float32).reshape(K, 3)
        gt_by_img.setdefault(a["image_id"], []).append(g)
    for iid, preds in by_img.items():
        gts = gt_by_img[iid]
        for kp in preds:
            for k in range(K):
                best = min(np.abs(kp[k, :2] - g[k, :2]).max() for g in gts)
                # 1 heatmap px = 4 source px here: proves the JSON is in
                # SOURCE pixels (a crop/heatmap-space bug would be >40 px)
                assert best < 4.0, (iid, k, best)


def test_oksap_end_to_end_shifted(coco_val_root):
    """A 4-heatmap-px systematic shift (~21 source px) keeps OKS above 0.5
    but drops it below 0.75: AP50 must beat AP75."""
    out = _run_eval(coco_val_root, shift=4)
    assert out["mAP50"] > 0.9, out
    assert out["mAP75"] < 0.5, out
    assert out["mAP50"] > out["mAP75"]


def test_oksap_end_to_end_int8(coco_val_root):
    """The full quantized pipeline (calibrate -> int8 conv -> DARK decode
    -> OKS-AP) preserves COCO mAP on the GT-perfect synthetic set."""
    import os as _os

    from tpupose.data.coco import CocoTopDownDataset
    from tpupose.data.loader import BatchLoader
    from tpupose.engine.evaluator import TopDownEvaluator
    from tpupose.metrics.oks_ap import OKSAP
    from tpupose.ops.quant import calibrate

    class Model(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            m = jnp.asarray(IMAGENET_MEAN)
            s = jnp.asarray(IMAGENET_STD)
            x = x.astype(jnp.float32) * s + m
            return nn.Conv(K, (4, 4), (4, 4), padding="VALID",
                           use_bias=False, dtype=jnp.float32,
                           name="pool_conv")(x) * 16.0

    state = _make_state(Model())
    # per-channel box-filter kernel: channel k pools image channel k
    kernel = np.zeros((4, 4, 3, K), np.float32)
    for k in range(K):
        kernel[:, :, k, k] = 1.0 / 16.0
    state = state.replace(params={"pool_conv": {"kernel": jnp.asarray(kernel)}})

    ds = CocoTopDownDataset(
        image_dir=_os.path.join(coco_val_root, "val2017"),
        ann_file=_os.path.join(coco_val_root, "annotations",
                               "person_keypoints_val2017.json"),
        image_size=IMG_SIZE, heatmap_size=HM_SIZE, is_train=False)
    loader = BatchLoader(ds, batch_size=4, shuffle=False, drop_last=False,
                         pad_last=True)

    batch = next(iter(loader))
    from tpupose.ops.preprocess import normalize_images
    scales = calibrate(
        state.apply_fn,
        {"params": state.params, "batch_stats": state.batch_stats},
        [jnp.asarray(batch["images"])], preprocess=normalize_images,
        train=False)
    assert "pool_conv" in scales

    sigmas = np.full(K, 0.05, np.float32)
    ev = TopDownEvaluator(state, HM_SIZE, decode="dark", flip_test=False,
                          quant_scales=scales)
    out = ev.run(loader, [OKSAP(num_classes=1, sigmas=sigmas)])
    assert out["mAP"] > 0.95, out
