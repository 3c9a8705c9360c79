"""PDJ — Percentage of Detected Joints (torso-size normalized).

Capability parity with the reference PDJ (HPE/core/metric/pdj.py:5-153):
correct if distance <= alpha * torso_diameter, torso defined by two joints
(e.g. left shoulder / right hip).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpupose.metrics.pck import PCK


class PDJ(PCK):
    def __init__(self, alpha: float = 0.2, torso_indices=(5, 12)):
        super().__init__(alpha=alpha)
        self.torso_indices = torso_indices

    def torso_size(self, gt, vis=None):
        i, j = self.torso_indices
        ts = jnp.linalg.norm(gt[:, i] - gt[:, j], axis=-1)
        if vis is not None:
            ok = (vis[:, i] > 0) & (vis[:, j] > 0)
            ts = jnp.where(ok, ts, 0.0)
        return ts

    def update(self, pred, gt, vis, normalizer=None):
        pred, gt, vis = map(jnp.asarray, (pred, gt, vis))
        if normalizer is None:
            normalizer = self.torso_size(gt, vis)
        super().update(pred, gt, vis, normalizer=normalizer)

    def compute(self) -> dict:
        out = super().compute()
        out["pdj"] = out.pop("pck")
        return out
