"""Every shipped method YAML merges cleanly and names known factories
(reference ships per-experiment yamls under configs/method/ —
HPE/configs/method/*, pose/configs/method/{dinov3_pose,dinov3vitpose}.yaml;
a yaml naming an unknown model/loss/dataset would only fail at run time)."""

import glob
import os

import pytest

from tpupose.configs.parser import load_config

METHOD_DIR = os.path.join(os.path.dirname(__file__), "..",
                          "tpupose", "configs", "method")
YAMLS = sorted(glob.glob(os.path.join(METHOD_DIR, "*.yaml")))

KNOWN_MODELS = {"simple_baseline", "hrnet", "dinov3_pose", "deeppose",
                "fcmae", "fskd", "simcc", "vitpose", "bottom_up"}
KNOWN_LOSSES = {"joints_mse", "joints_mse_weighted", "pose_compute",
                "coord_mse", "v8_pose", "fcmae", "fskd_episode", "simcc_kl",
                "rle", "ae"}
KNOWN_DATASETS = {"synthetic", "synthetic_yolo", "yolo_pose", "coco",
                  "mpii", "fewshot"}


def test_method_yamls_present():
    names = {os.path.basename(p) for p in YAMLS}
    # the reference's experiment surface (SURVEY §2.2) must be covered
    for required in ("deep_pose.yaml", "fskd_small.yaml",
                     "dinov3_pose.yaml", "dinov3_vitpose.yaml"):
        assert required in names, f"missing method config {required}"


@pytest.mark.parametrize("path", YAMLS, ids=[os.path.basename(p) for p in YAMLS])
def test_method_yaml_merges_and_names_resolve(path):
    cfg = load_config(path)
    assert cfg.model.name in KNOWN_MODELS, cfg.model.name
    assert cfg.loss.name in KNOWN_LOSSES, cfg.loss.name
    assert cfg.data.name in KNOWN_DATASETS, cfg.data.name
