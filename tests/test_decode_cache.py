"""Decode-once/warp-per-epoch cache (data/coco.py + native/io.cc):
bit-exactness vs the fused decode+warp path, cache-hit reuse, and the
LRU byte budget."""
import json
import os

import numpy as np
import pytest

from tpupose.data.native_io import get_lib


def _fake_coco(root, n=12, hw=(320, 400)):
    from PIL import Image

    os.makedirs(os.path.join(root, "train2017"), exist_ok=True)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    rng = np.random.RandomState(0)
    H0, W0 = hw
    images, anns = [], []
    for i in range(n):
        name = f"{i:012d}.jpg"
        arr = rng.randint(0, 255, (H0, W0, 3)).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(root, "train2017", name),
                                  quality=92)
        images.append({"id": i, "file_name": name, "width": W0,
                       "height": H0})
        kp = []
        for _ in range(17):
            kp += [float(rng.uniform(20, W0 - 20)),
                   float(rng.uniform(20, H0 - 20)), 2]
        anns.append({"id": i, "image_id": i, "category_id": 1,
                     "bbox": [10, 10, W0 - 30, H0 - 30], "keypoints": kp,
                     "num_keypoints": 17, "area": 1.0 * W0 * H0,
                     "iscrowd": 0})
    p = os.path.join(root, "annotations",
                     "person_keypoints_train2017.json")
    with open(p, "w") as f:
        json.dump({"images": images, "annotations": anns}, f)
    return os.path.join(root, "train2017"), p


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    return _fake_coco(str(tmp_path_factory.mktemp("coco")))


@pytest.mark.skipif(get_lib() is None, reason="native io unavailable")
def test_cached_path_bit_exact_and_reused(coco_dir):
    from tpupose.data.coco import CocoTopDownDataset

    img_dir, ann = coco_dir
    kw = dict(image_dir=img_dir, ann_file=ann, image_size=(64, 48),
              heatmap_size=(16, 12), is_train=True, seed=3)
    plain = CocoTopDownDataset(**kw)
    cached = CocoTopDownDataset(decode_cache_mb=64, **kw)
    idx = np.arange(12)
    b_plain = plain.get_batch(idx)
    b_cached = cached.get_batch(idx)
    for a, b in zip(b_plain, b_cached):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_allclose(a["joints"], b["joints"])
    assert len(cached._cache) == 12
    # reuse: with deterministic geometry the shrink never changes, so a
    # second epoch must hit every entry (same cached arrays). (With
    # random scale augmentation an epoch MAY legitimately re-decode an
    # entry whose draw zooms in past the cached resolution.)
    det = CocoTopDownDataset(decode_cache_mb=64, **{
        **kw, "augment_geometry": False})
    det.get_batch(idx)
    keys = {p: id(v[0]) for p, v in det._cache.items()}
    b2 = det.get_batch(idx)
    assert {p: id(v[0]) for p, v in det._cache.items()} == keys
    assert all(b["image"].shape == (64, 48, 3) for b in b2)


@pytest.mark.skipif(get_lib() is None, reason="native io unavailable")
def test_cache_budget_evicts(coco_dir):
    from tpupose.data.coco import CocoTopDownDataset

    img_dir, ann = coco_dir
    # large crops -> small decode shrink -> ~200 KB cached per source:
    # 12 sources overflow a 1 MB budget and must evict
    ds = CocoTopDownDataset(image_dir=img_dir, ann_file=ann,
                            image_size=(256, 192), heatmap_size=(64, 48),
                            is_train=True, decode_cache_mb=1, seed=3)
    ds.get_batch(np.arange(12))
    budget = 1 << 20
    assert 0 < ds._cache_bytes <= budget
    assert len(ds._cache) < 12      # some eviction at a 1 MB budget
    # evicted entries re-decode on demand and still produce valid crops
    out = ds.get_batch(np.arange(12))
    assert all(o["image"].shape == (256, 192, 3) for o in out)
    assert any(o["image"].any() for o in out)
