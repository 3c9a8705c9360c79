"""PCP / PCPm — Percentage of Correct Parts.

Capability parity with the reference (HPE/core/metric/pcp.py, pcpm.py):
a limb (joint pair) is correct when BOTH endpoints are within
alpha * limb_length of their GT. PCPm replaces per-instance limb length
with the dataset-mean limb length.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# default limb set (COCO-ish skeleton segments)
DEFAULT_LIMBS = (
    (5, 7), (7, 9),      # left arm
    (6, 8), (8, 10),     # right arm
    (11, 13), (13, 15),  # left leg
    (12, 14), (14, 16),  # right leg
)


class PCP:
    def __init__(self, alpha: float = 0.5, limbs=DEFAULT_LIMBS):
        self.alpha = alpha
        self.limbs = np.asarray(limbs)
        self.reset()

    def reset(self):
        self.correct = np.zeros(len(self.limbs), np.int64)
        self.total = np.zeros(len(self.limbs), np.int64)

    def _limb_lengths(self, gt):
        a = gt[:, self.limbs[:, 0]]
        b = gt[:, self.limbs[:, 1]]
        return jnp.linalg.norm(a - b, axis=-1)  # (B, L)

    def update(self, pred, gt, vis):
        pred, gt, vis = map(jnp.asarray, (pred, gt, vis))
        L = self._limb_lengths(gt)
        da = jnp.linalg.norm(pred[:, self.limbs[:, 0]] - gt[:, self.limbs[:, 0]], axis=-1)
        db = jnp.linalg.norm(pred[:, self.limbs[:, 1]] - gt[:, self.limbs[:, 1]], axis=-1)
        valid = (vis[:, self.limbs[:, 0]] > 0) & (vis[:, self.limbs[:, 1]] > 0) & (L > 0)
        thr = self._threshold(L)
        ok = (da <= thr) & (db <= thr) & valid
        self.correct += np.asarray(jnp.sum(ok, axis=0))
        self.total += np.asarray(jnp.sum(valid, axis=0))

    def _threshold(self, L):
        return self.alpha * L

    def compute(self) -> dict:
        per_limb = self.correct / np.maximum(self.total, 1)
        return {"pcp": float(per_limb.mean()), "per_limb": per_limb}


class PCPm(PCP):
    """PCP with dataset-mean limb length threshold (two-pass free: keeps a
    running mean)."""

    def __init__(self, alpha: float = 0.5, limbs=DEFAULT_LIMBS):
        super().__init__(alpha=alpha, limbs=limbs)
        self._pending = []

    def reset(self):
        super().reset()
        self._pending = []

    def update(self, pred, gt, vis):
        # defer: PCPm needs the global mean limb length
        self._pending.append((np.asarray(pred), np.asarray(gt), np.asarray(vis)))

    def compute(self) -> dict:
        if not self._pending:
            return {"pcpm": 0.0, "per_limb": np.zeros(len(self.limbs))}
        gts = np.concatenate([g for _, g, _ in self._pending])
        viss = np.concatenate([v for _, _, v in self._pending])
        a = gts[:, self.limbs[:, 0]]
        b = gts[:, self.limbs[:, 1]]
        lens = np.linalg.norm(a - b, axis=-1)
        valid = (viss[:, self.limbs[:, 0]] > 0) & (viss[:, self.limbs[:, 1]] > 0)
        mean_len = (lens * valid).sum(0) / np.maximum(valid.sum(0), 1)  # (L,)
        correct = np.zeros(len(self.limbs), np.int64)
        total = np.zeros(len(self.limbs), np.int64)
        for pred, gt, vis in self._pending:
            da = np.linalg.norm(pred[:, self.limbs[:, 0]] - gt[:, self.limbs[:, 0]], axis=-1)
            db = np.linalg.norm(pred[:, self.limbs[:, 1]] - gt[:, self.limbs[:, 1]], axis=-1)
            v = (vis[:, self.limbs[:, 0]] > 0) & (vis[:, self.limbs[:, 1]] > 0)
            thr = self.alpha * mean_len[None, :]
            ok = (da <= thr) & (db <= thr) & v
            correct += ok.sum(0)
            total += v.sum(0)
        per_limb = correct / np.maximum(total, 1)
        return {"pcpm": float(per_limb.mean()), "per_limb": per_limb}
