"""Half-body transform (data.half_body_prob): the crop re-centers on the
visible upper- or lower-body joints, labels stay self-consistent."""

import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("hb_coco")
    os.makedirs(root / "train2017")
    os.makedirs(root / "annotations")
    rng = np.random.RandomState(0)
    W0, H0 = 320, 320
    Image.fromarray(rng.randint(0, 255, (H0, W0, 3)).astype(np.uint8)) \
        .save(root / "train2017" / "000000000001.jpg")
    # upper-body joints clustered top-left, lower-body bottom-right:
    # the two halves give clearly different crops
    kp = []
    for k in range(17):
        if k < 11:
            x, y = 40 + 4 * k, 40 + 3 * k
        else:
            x, y = 200 + 4 * (k - 11), 220 + 5 * (k - 11)
        kp += [float(x), float(y), 2]
    ann = {"id": 1, "image_id": 1, "category_id": 1,
           "bbox": [30, 30, 230, 260], "keypoints": kp,
           "num_keypoints": 17, "area": 230 * 260, "iscrowd": 0}
    with open(root / "annotations" / "person_keypoints_train2017.json",
              "w") as f:
        json.dump({"images": [{"id": 1, "file_name": "000000000001.jpg",
                               "width": W0, "height": H0}],
                   "annotations": [ann]}, f)
    return str(root)


def _make_ds(coco_root, prob):
    from tpupose.data.coco import CocoTopDownDataset

    return CocoTopDownDataset(
        image_dir=os.path.join(coco_root, "train2017"),
        ann_file=os.path.join(coco_root, "annotations",
                              "person_keypoints_train2017.json"),
        image_size=(64, 64), heatmap_size=(16, 16), is_train=True,
        flip_prob=0.0, half_body_prob=prob, seed=3)


def test_half_body_changes_crop(coco_root):
    ds_full = _make_ds(coco_root, prob=0.0)
    ds_half = _make_ds(coco_root, prob=1.0)
    _, c_full, s_full, *_ = ds_full._sample_params(0)

    saw_upper = saw_lower = False
    for _ in range(20):
        s, center, scale, rot, flipped, joints_src, vis = \
            ds_half._sample_params(0)
        # crop must be tighter than the full-body crop and centered on one
        # of the two joint clusters
        assert scale[0] < s_full[0] and scale[1] < s_full[1]
        if center[0] < 100 and center[1] < 100:
            saw_upper = True
            pts = joints_src[:11]
        else:
            assert center[0] > 150 and center[1] > 150
            saw_lower = True
            pts = joints_src[11:]
        # the selected half's joints all fit inside the (padded) crop
        half_w, half_h = scale[0] / 2, scale[1] / 2
        assert np.all(np.abs(pts[:, 0] - center[0]) <= half_w + 1e-3)
        assert np.all(np.abs(pts[:, 1] - center[1]) <= half_h + 1e-3)
    assert saw_upper and saw_lower, "both halves should be sampled"


def test_half_body_respects_min_joints(coco_root):
    ds = _make_ds(coco_root, prob=1.0)
    ds.half_body_min_joints = 20          # > 17 visible -> never triggers
    _, c0, s0, *_ = _make_ds(coco_root, prob=0.0)._sample_params(0)
    for _ in range(5):
        _, center, scale, *_ = ds._sample_params(0)
        # only the scale jitter applies; the center is the full-body one
        np.testing.assert_allclose(center, c0, atol=1e-5)


def test_half_body_labels_consistent(coco_root):
    """joints/visibility produced under half-body still satisfy the
    dataset contract: heatmap-coord joints inside the grid are visible."""
    ds = _make_ds(coco_root, prob=1.0)
    s, center, scale, rot, flipped, joints_src, vis = ds._sample_params(0)
    lab = ds._labels(s, center, scale, rot, flipped, joints_src, vis)
    j = lab["joints"]
    v = lab["visibility"]
    inside = ((j[:, 0] >= 0) & (j[:, 0] < 16)
              & (j[:, 1] >= 0) & (j[:, 1] < 16))
    assert np.all(v[~inside] == 0)
    assert v.sum() >= 2          # the selected half stays supervised
