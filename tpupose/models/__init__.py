"""Model registry (reference: HPE/models/__init__.py:1-12 __all__-based
name lookup for Builder.model(), HPE/core/builder.py:15-24)."""

from tpupose.models.simple_baseline import SimpleBaseline
from tpupose.models.dinov3_pose import DINOv3Pose
from tpupose.models.heads import HeatmapHead, RegressionHead, ClassifyHead

MODELS = {
    "simple_baseline": SimpleBaseline,
    "dinov3_pose": DINOv3Pose,
}


def register_model(name: str, cls):
    MODELS[name] = cls
    return cls


def get_model(name: str):
    if name not in MODELS:
        raise ValueError(f"unknown model {name!r}; have {sorted(MODELS)}")
    return MODELS[name]


__all__ = ["MODELS", "register_model", "get_model",
           "SimpleBaseline", "HeatmapHead", "RegressionHead", "ClassifyHead"]
