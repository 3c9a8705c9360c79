from tpupose.ops.affine import (
    get_affine_matrix, affine_warp, affine_transform_points, transform_preds,
)
from tpupose.ops.heatmap import gaussian_heatmaps, heatmap_target_weights
from tpupose.ops.decode import (
    get_max_preds, decode_heatmaps, flip_back, dark_refine, gaussian_blur,
)
from tpupose.ops.nms import nms, batched_pose_nms
from tpupose.ops.preprocess import normalize_images

__all__ = [
    "get_affine_matrix", "affine_warp", "affine_transform_points", "transform_preds",
    "gaussian_heatmaps", "heatmap_target_weights",
    "get_max_preds", "decode_heatmaps", "flip_back", "dark_refine", "gaussian_blur",
    "nms", "batched_pose_nms", "normalize_images",
]
