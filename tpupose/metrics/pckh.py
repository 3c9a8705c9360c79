"""PCKh — PCK normalized by head size.

Capability parity with the reference PCKh (HPE/core/metric/pckh.py:5-171,
duplicated at HPE/core/metrics/pckh.py): the normalizer is the distance
between two head joints (e.g. MPII head-top and upper-neck) or an explicit
(N,) tensor.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tpupose.metrics.pck import PCK


class PCKh(PCK):
    def __init__(self, alpha: float = 0.5, head_indices=(9, 8), head_ratio: float = 0.6):
        super().__init__(alpha=alpha)
        self.head_indices = head_indices
        self.head_ratio = head_ratio  # MPII convention scales head segment by 0.6

    def head_size(self, gt, vis=None):
        i, j = self.head_indices
        hs = jnp.linalg.norm(gt[:, i] - gt[:, j], axis=-1) * self.head_ratio
        if vis is not None:
            ok = (vis[:, i] > 0) & (vis[:, j] > 0)
            hs = jnp.where(ok, hs, 0.0)
        return hs

    def update(self, pred, gt, vis, normalizer=None):
        pred, gt, vis = map(jnp.asarray, (pred, gt, vis))
        if normalizer is None:
            normalizer = self.head_size(gt, vis)
        super().update(pred, gt, vis, normalizer=normalizer)

    def compute(self) -> dict:
        out = super().compute()
        out["pckh"] = out.pop("pck")
        return out
