"""Inference/visualization CLI (HPE/test.py analog): resize -> fused
forward+NMS -> rescale -> headless render."""

import os

import numpy as np
import pytest
from PIL import Image


@pytest.mark.slow
def test_run_inference_writes_renders(tmp_path):
    imgs = tmp_path / "imgs"
    out = tmp_path / "viz"
    imgs.mkdir()
    rng = np.random.RandomState(0)
    names = ["a.jpg", "b.png"]
    for n in names:
        Image.fromarray(rng.randint(0, 255, (80, 100, 3)).astype(np.uint8)
                        ).save(imgs / n)

    from tpupose.cli.test import run_inference
    from tpupose.configs.default import Config

    cfg = Config()
    cfg.model.name = "dinov3_pose"
    cfg.model.backbone = "dinov3_convnext_atto"
    cfg.model.num_keypoints = 4
    cfg.model.num_classes = 2
    cfg.model.neck_channels = [48, 96, 192]
    cfg.data.image_size = [64, 64]
    cfg.train.mixed_precision = False
    cfg.eval.conf_threshold = 0.0   # random weights: keep detections
    run_inference(cfg, str(imgs), str(out))

    for n in names:
        p = out / n
        assert os.path.exists(p)
        # rendered at the ORIGINAL resolution, not the model input size
        assert Image.open(p).size == (100, 80)

    # eval.int8: the quantized serving path (calibrate on the first image,
    # int8 predictor) produces the same outputs end-to-end
    out_q = tmp_path / "viz_int8"
    cfg.eval.int8 = True
    run_inference(cfg, str(imgs), str(out_q))
    for n in names:
        assert os.path.exists(out_q / n)


@pytest.mark.slow
def test_run_inference_bottom_up(tmp_path):
    """model.name=bottom_up dispatches to the detector-free predictor and
    renders people at the original resolution (int8 path included)."""
    imgs = tmp_path / "imgs"
    out = tmp_path / "viz"
    imgs.mkdir()
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (80, 100, 3)).astype(np.uint8)
                    ).save(imgs / "a.jpg")

    from tpupose.cli.test import run_inference
    from tpupose.configs.default import Config

    cfg = Config()
    cfg.model.name = "bottom_up"
    cfg.model.backbone = "resnet18"
    cfg.model.deconv_channels = (32, 32, 32)
    cfg.model.num_keypoints = 4
    cfg.data.image_size = [64, 64]
    cfg.data.max_instances = 6
    cfg.train.mixed_precision = False
    run_inference(cfg, str(imgs), str(out))
    assert os.path.exists(out / "a.jpg")
    assert Image.open(out / "a.jpg").size == (100, 80)

    out_q = tmp_path / "viz_int8"
    cfg.eval.int8 = True
    run_inference(cfg, str(imgs), str(out_q))
    assert os.path.exists(out_q / "a.jpg")
