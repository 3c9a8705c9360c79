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
