"""Model registry (reference: HPE/models/__init__.py:1-12 __all__-based
name lookup for Builder.model(), HPE/core/builder.py:15-24)."""

from tpupose.models.simple_baseline import SimpleBaseline
from tpupose.models.dinov3_pose import DINOv3Pose
from tpupose.models.deeppose import DeepPose
from tpupose.models.backbones.hrnet import HRNetPose
from tpupose.models.fcmae import FCMAE
from tpupose.models.fskd import FSKD
from tpupose.models.bottom_up import BottomUpPose
from tpupose.models.simcc import SimCCPose
from tpupose.models.vitpose import ViTPose
from tpupose.models.heads import HeatmapHead, RegressionHead, ClassifyHead
from tpupose.models.attention import Attention, GatedAttention
from tpupose.models.meta import MetaSpace, gaussian_pool

MODELS = {
    "simple_baseline": SimpleBaseline,
    "dinov3_pose": DINOv3Pose,
    "hrnet": HRNetPose,
    "deeppose": DeepPose,
    "fcmae": FCMAE,
    "fskd": FSKD,
    "simcc": SimCCPose,
    "vitpose": ViTPose,
    "bottom_up": BottomUpPose,
}


def register_model(name: str, cls):
    MODELS[name] = cls
    return cls


def get_model(name: str):
    if name not in MODELS:
        raise ValueError(f"unknown model {name!r}; have {sorted(MODELS)}")
    return MODELS[name]


__all__ = ["MODELS", "register_model", "get_model",
           "SimpleBaseline", "DINOv3Pose", "DeepPose", "HRNetPose",
           "FCMAE", "FSKD", "SimCCPose", "ViTPose", "BottomUpPose",
           "HeatmapHead", "RegressionHead", "ClassifyHead",
           "Attention", "GatedAttention", "MetaSpace", "gaussian_pool"]
