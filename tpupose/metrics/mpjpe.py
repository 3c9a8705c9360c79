"""MPJPE — Mean Per-Joint Position Error with visibility mask
(reference: HPE/core/metric/mpjpe.py:4-64). Works for 2D or 3D joints."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class MPJPE:
    def __init__(self):
        self.reset()

    def reset(self):
        self.err_sum = 0.0
        self.count = 0

    def update(self, pred, gt, vis=None):
        pred, gt = jnp.asarray(pred), jnp.asarray(gt)
        d = jnp.linalg.norm(pred - gt, axis=-1)  # (B, K)
        if vis is not None:
            m = (jnp.asarray(vis) > 0)
            self.err_sum += float(jnp.sum(d * m))
            self.count += int(jnp.sum(m))
        else:
            self.err_sum += float(jnp.sum(d))
            self.count += int(np.prod(d.shape))

    def compute(self) -> dict:
        return {"mpjpe": self.err_sum / max(self.count, 1)}
