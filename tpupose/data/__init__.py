from tpupose.data.synthetic import SyntheticTopDownDataset, SyntheticYoloPoseDataset
from tpupose.data.yolo_pose import YoloPoseDataset
from tpupose.data.loader import BatchLoader, prefetch_to_device

__all__ = [
    "SyntheticTopDownDataset", "SyntheticYoloPoseDataset",
    "YoloPoseDataset", "BatchLoader", "prefetch_to_device",
]
