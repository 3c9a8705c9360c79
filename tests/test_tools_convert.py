"""cli/tools convert-coco: COCO keypoints JSON -> YOLO-pose txt labels,
round-tripped through YoloPoseDataset (the consumer of that format)."""

import json
import os

import numpy as np


def _coco(tmp_path, K=4):
    from PIL import Image

    (tmp_path / "images").mkdir()
    rng = np.random.RandomState(0)
    images, anns = [], []
    aid = 0
    for i in range(3):
        W0, H0 = 320, 240
        name = f"img_{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (H0, W0, 3)).astype(np.uint8)
                        ).save(tmp_path / "images" / name)
        images.append({"id": i, "file_name": name, "width": W0,
                       "height": H0})
        for p in range(1 + i % 2):
            x, y, w, h = 30.0 + 90 * p, 40.0, 80.0, 120.0
            kp = []
            for k in range(K):
                kp += [x + 10 + 12 * k, y + 15 + 20 * k, 2]
            anns.append({"id": aid, "image_id": i, "category_id": 1,
                         "bbox": [x, y, w, h], "keypoints": kp,
                         "num_keypoints": K, "area": w * h, "iscrowd": 0})
            aid += 1
    # one crowd + one keypointless annotation must be skipped
    anns.append({"id": aid, "image_id": 0, "category_id": 1,
                 "bbox": [0, 0, 10, 10], "keypoints": [0, 0, 0] * K,
                 "num_keypoints": 0, "area": 100, "iscrowd": 1})
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps({"images": images, "annotations": anns}))
    return str(ann), K


def test_convert_coco_roundtrip(tmp_path):
    from tpupose.cli.tools import main
    from tpupose.data.yolo_pose import YoloPoseDataset

    ann, K = _coco(tmp_path)
    out = str(tmp_path / "labels")
    assert main(["convert-coco", "--ann", ann, "--out", out]) == 0
    files = sorted(os.listdir(out))
    assert files == ["img_0.txt", "img_1.txt", "img_2.txt"]
    # img_1 has 2 instances; img_0's crowd/empty annotations are skipped
    assert len(open(os.path.join(out, "img_1.txt")).readlines()) == 2
    assert len(open(os.path.join(out, "img_0.txt")).readlines()) == 1

    ds = YoloPoseDataset(image_dir=str(tmp_path / "images"), label_dir=out,
                         num_keypoints=K, image_size=(64, 64),
                         max_instances=4)
    assert len(ds) == 3
    d = ds[1]
    m = d["instance_mask"].astype(bool)
    assert m.sum() == 2
    # normalized bbox round trip: cx = (30 + 40)/320 and (120 + 40)/320
    got = sorted(np.round(d["boxes"][m][:, 0], 4))
    assert got == [round(70 / 320, 4), round(160 / 320, 4)]
    # keypoints normalized against the SOURCE dims, visible
    kx = d["keypoints"][m][0, 0, 0]
    assert abs(kx - (30 + 10) / 320) < 1e-4 or abs(kx - (120 + 10) / 320) < 1e-4
    assert (d["keypoints"][m][:, :, 2] == 2).all() or \
           (d["keypoints"][m][:, :, 2] == 1).all()


def test_convert_coco_visibility_preserved(tmp_path):
    from tpupose.cli.tools import convert_coco

    ann, K = _coco(tmp_path)
    data = json.loads(open(ann).read())
    data["annotations"][0]["keypoints"][2] = 1     # occluded joint
    data["annotations"][0]["keypoints"][5] = 0     # unlabeled joint
    open(ann, "w").write(json.dumps(data))
    out = str(tmp_path / "labels2")
    convert_coco(ann, out)
    rows = np.loadtxt(os.path.join(out, "img_0.txt"), ndmin=2)
    assert rows.shape[1] == 5 + 3 * K
    assert rows[0, 7] == 1.0      # v of kpt 0
    assert rows[0, 10] == 0.0     # v of kpt 1
