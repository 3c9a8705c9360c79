"""Batched video pipeline CLI: chunked device detection + causal host
tracking (reference surface: pose/dino_tracking.ipynb, BASELINE config 5).
5 frames with video_batch=2 exercises chunking AND the repeat-padded tail
(one compiled batch shape)."""

import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.mark.slow
def test_run_video_batched(tmp_path):
    frames_dir = tmp_path / "frames"
    out_dir = tmp_path / "out"
    frames_dir.mkdir()
    rng = np.random.RandomState(0)
    names = [f"f_{i}.png" for i in range(5)]
    for n in names:
        Image.fromarray(rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
                        ).save(frames_dir / n)

    from tpupose.cli.video import run_video
    from tpupose.configs.default import Config

    cfg = Config()
    cfg.model.name = "dinov3_pose"
    cfg.model.backbone = "dinov3_convnext_atto"
    cfg.model.num_keypoints = 4
    cfg.model.num_classes = 2
    cfg.model.neck_channels = [48, 96, 192]
    cfg.data.image_size = [64, 64]
    cfg.train.mixed_precision = False
    cfg.eval.video_batch = 2
    cfg.eval.conf_threshold = 0.0   # random weights: keep some detections
    run_video(cfg, str(frames_dir), str(out_dir))

    lines = [json.loads(s) for s in
             open(out_dir / "tracks.jsonl").read().splitlines()]
    # one JSONL record per REAL frame (tail padding adds no phantom frames)
    assert [r["frame"] for r in lines] == list(range(5))
    assert [r["file"] for r in lines] == names
    for n in names:  # every frame rendered
        assert os.path.exists(out_dir / n)


@pytest.mark.slow
def test_run_video_two_stage(tmp_path):
    """pose_cfg= switches on the two-stage path: detector boxes -> device
    crops -> top-down heatmap pose (BASELINE config 5's literal shape).
    Runs with eval.int8=True so BOTH stages go through the quantized
    serving path (detector + stage-2 calibration on the first frame)."""
    frames_dir = tmp_path / "frames"
    out_dir = tmp_path / "out2"
    frames_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
                        ).save(frames_dir / f"f_{i}.png")
    pose_yaml = tmp_path / "pose.yaml"
    pose_yaml.write_text(
        "model:\n  name: simple_baseline\n  backbone: resnet18\n"
        "  num_keypoints: 6\n  heatmap_size: [16, 16]\n"
        "  deconv_channels: [32, 32, 32]\n"
        "data:\n  image_size: [64, 64]\n"
        "train:\n  mixed_precision: false\n")

    from tpupose.cli.video import run_video
    from tpupose.configs.default import Config

    cfg = Config()
    cfg.model.name = "dinov3_pose"
    cfg.model.backbone = "dinov3_convnext_atto"
    cfg.model.num_keypoints = 4
    cfg.model.num_classes = 2
    cfg.model.neck_channels = [48, 96, 192]
    cfg.data.image_size = [64, 64]
    cfg.train.mixed_precision = False
    cfg.eval.video_batch = 2
    cfg.eval.conf_threshold = 0.0
    cfg.eval.int8 = True
    run_video(cfg, str(frames_dir), str(out_dir), pose_cfg=str(pose_yaml))

    lines = [json.loads(s) for s in
             open(out_dir / "tracks.jsonl").read().splitlines()]
    assert len(lines) == 3
    # refined keypoints come from the top-down model: 6 joints, not 4
    for r in lines:
        for t in r["tracks"]:
            assert len(t["keypoints"]) == 6
