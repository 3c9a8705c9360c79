"""Native host-IO runtime (C++/libjpeg via ctypes) + the YoloPoseDataset
integration. Skips gracefully when the toolchain is unavailable."""

import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.RandomState(0)
    for i in range(4):
        # smooth gradient images: resize-algorithm differences stay small
        x = np.linspace(0, 255, 320, dtype=np.float32)
        img = np.stack([np.tile(x, (240, 1))] * 3, -1).astype(np.uint8)
        img += rng.randint(0, 10, img.shape).astype(np.uint8)
        Image.fromarray(img).save(d / f"im{i}.jpg", quality=92)
    return str(d)


def test_native_decode_matches_pil_closely(jpeg_dir):
    from tpupose.data.native_io import decode_jpeg_batch, get_lib

    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    import glob

    paths = sorted(glob.glob(os.path.join(jpeg_dir, "*.jpg")))
    out = decode_jpeg_batch(paths, 128, 96, num_threads=4)
    assert out.shape == (4, 128, 96, 3)
    ref = np.asarray(Image.open(paths[0]).convert("RGB").resize((96, 128)),
                     np.uint8)
    diff = np.abs(out[0].astype(int) - ref.astype(int)).mean()
    assert diff < 6.0, diff  # different resize filters; must stay close


def test_native_decode_missing_file_zero_fills(jpeg_dir):
    from tpupose.data.native_io import decode_jpeg_batch, get_lib

    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    out = decode_jpeg_batch([os.path.join(jpeg_dir, "nope.jpg")], 32, 32)
    assert (out == 0).all()


def test_native_label_parser_formats(tmp_path):
    from tpupose.data.native_io import parse_yolo_label

    p = tmp_path / "l.txt"
    p.write_text("0 0.5 0.5 0.2 0.2 0.4 0.4 2\n1 0.1 0.1 0.1 0.1 0.2 0.2 1\n")
    rows = parse_yolo_label(str(p), 8)
    assert rows.shape == (2, 8)
    np.testing.assert_allclose(rows[0], [0, 0.5, 0.5, 0.2, 0.2, 0.4, 0.4, 2],
                               atol=1e-6)
    # wrong column count -> None
    bad = tmp_path / "b.txt"
    bad.write_text("0 0.5 0.5\n")
    assert parse_yolo_label(str(bad), 8) is None
    # missing -> empty
    assert parse_yolo_label(str(tmp_path / "x.txt"), 8).shape == (0, 8)


def test_yolo_dataset_uses_native_path(tmp_path, jpeg_dir):
    import glob
    import shutil

    from tpupose.data.yolo_pose import YoloPoseDataset

    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    for i, p in enumerate(sorted(glob.glob(os.path.join(jpeg_dir, "*.jpg")))):
        shutil.copy(p, img_dir / f"im{i}.jpg")
        # 3-dim kpt row for K=1
        (lbl_dir / f"im{i}.txt").write_text("0 0.5 0.5 0.4 0.4 0.5 0.5 2\n")
    ds = YoloPoseDataset(str(img_dir), str(lbl_dir), image_size=(64, 64),
                         num_keypoints=1, max_instances=4)
    assert len(ds) == 4
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["instance_mask"].sum() == 1
    np.testing.assert_allclose(s["keypoints"][0, 0], [0.5, 0.5, 2.0])

    # 2-dim kpt format pads v=1
    (lbl_dir / "im0.txt").write_text("0 0.5 0.5 0.4 0.4 0.3 0.3\n")
    ds2 = YoloPoseDataset(str(img_dir), str(lbl_dir), image_size=(64, 64),
                          num_keypoints=1, max_instances=4)
    s2 = ds2[0]
    np.testing.assert_allclose(s2["keypoints"][0, 0], [0.3, 0.3, 1.0])


def test_decode_warp_batch_matches_pil_path(tmp_path):
    """The fused C++ decode+affine crop must match the PIL fallback crop
    (same matrix) within JPEG/bilinear tolerance, and labels are
    identical because geometry is drawn once."""
    import json

    import numpy as np
    from PIL import Image

    from tpupose.data.coco import CocoTopDownDataset
    from tpupose.data.native_io import decode_warp_batch, get_lib

    if get_lib() is None:
        import pytest

        pytest.skip("native lib unavailable")

    root = tmp_path
    (root / "val2017").mkdir()
    (root / "annotations").mkdir()
    rng = np.random.RandomState(0)
    images, anns = [], []
    for i in range(4):
        W0, H0 = 320, 280
        # smooth image: decode-scale differences stay tiny
        yy, xx = np.mgrid[0:H0, 0:W0]
        img = np.stack([(xx * 255 / W0), (yy * 255 / H0),
                        ((xx + yy) * 127 / (W0 + H0))], -1).astype(np.uint8)
        name = f"{i:012d}.jpg"
        Image.fromarray(img).save(root / "val2017" / name, quality=97)
        images.append({"id": i, "file_name": name, "width": W0, "height": H0})
        kp = []
        for k in range(17):
            kp += [60.0 + 10 * k, 50.0 + 9 * k, 2]
        anns.append({"id": i, "image_id": i, "category_id": 1,
                     "bbox": [40, 30, 200, 220], "keypoints": kp,
                     "num_keypoints": 17, "area": 44000, "iscrowd": 0})
    with open(root / "annotations" / "person_keypoints_val2017.json", "w") as f:
        json.dump({"images": images, "annotations": anns}, f)

    ds = CocoTopDownDataset(
        image_dir=str(root / "val2017"),
        ann_file=str(root / "annotations" / "person_keypoints_val2017.json"),
        image_size=(128, 96), heatmap_size=(32, 24), is_train=False)
    fast = ds.get_batch([0, 1, 2, 3])
    slow = [ds[i] for i in range(4)]
    for a, b in zip(fast, slow):
        np.testing.assert_allclose(a["joints"], b["joints"])
        np.testing.assert_allclose(a["center"], b["center"])
        diff = np.abs(a["image"].astype(np.float32)
                      - b["image"].astype(np.float32))
        assert diff.mean() < 4.0, diff.mean()


def test_dct_prescale_subpixel_alignment(tmp_path):
    """A white Gaussian dot at a known source position must land at its
    projected crop position to sub-pixel accuracy even when the decode
    runs heavily DCT-prescaled (the matrix rescale uses the pixel-center
    convention (x+0.5)*rx-0.5; plain x*rx shifts ~0.4 px at 1/8 scale)."""
    import numpy as np
    import pytest
    from PIL import Image

    from tpupose.data.native_io import decode_warp_batch, get_lib

    if get_lib() is None:
        pytest.skip("native lib unavailable")

    W0 = H0 = 1600
    dot = (801.0, 777.0)
    yy, xx = np.mgrid[0:H0, 0:W0]
    g = np.exp(-(((xx - dot[0]) ** 2 + (yy - dot[1]) ** 2)
                 / (2 * 24.0 ** 2)))
    img = np.repeat((g * 255).astype(np.uint8)[..., None], 3, -1)
    path = tmp_path / "dot.jpg"
    Image.fromarray(img).save(path, quality=97)

    # dst->src: 64x64 crop of a 1024x1024 window centered on the dot ->
    # 16 src px per dst px -> libjpeg decodes at 1/8 scale
    s = 1024.0 / 64.0
    m = np.array([[s, 0.0, dot[0] - s * 32.0],
                  [0.0, s, dot[1] - s * 32.0]], np.float32)
    imgs, ok = decode_warp_batch([str(path)], m[None], 64, 64)
    assert ok.all()
    crop = imgs[0, :, :, 0].astype(np.float64)
    ys, xs = np.mgrid[0:64, 0:64]
    w = crop / crop.sum()
    cx, cy = float((xs * w).sum()), float((ys * w).sum())
    # expected dst position of the dot: m^{-1} @ dot = (32, 32)
    assert abs(cx - 32.0) < 0.15, cx
    assert abs(cy - 32.0) < 0.15, cy


def test_pil_crop_matches_matrix_convention():
    """pil_affine_crop samples at m @ (x, y) like the native/device warps
    (PIL's raw transform is off by half a pixel times the scale)."""
    import numpy as np

    from tpupose.data.coco import pil_affine_crop

    H0 = W0 = 64
    ramp = (np.arange(W0, dtype=np.float32)[None, :].repeat(H0, 0) * 3.0)
    img = np.repeat(ramp.astype(np.uint8)[..., None], 3, -1)
    m = np.array([[2.0, 0.0, 5.0], [0.0, 2.0, 7.0]], np.float32)
    crop = pil_affine_crop(img, m, (16, 16)).astype(np.float32)
    xs = np.arange(16, dtype=np.float32)
    expected = (2.0 * xs + 5.0) * 3.0            # src = m @ (x, y)
    got = crop[4, :, 0]
    assert np.abs(got - expected).max() <= 1.0, (got, expected)
