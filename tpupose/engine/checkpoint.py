"""Orbax checkpointing: periodic + best, with resume.

Capability parity with the reference's three checkpoint flavors
(SURVEY.md §5.4; pose/pose/engine/trainer.py:124-133 periodic+best
model-only; HPE/engine/trainer.py:40-57 {epoch, model, optimizer}):
here every checkpoint carries {params, batch_stats, opt_state, step} so
resume is always exact, and `best.ckpt`-equivalent tracking is built in.
Orbax handles multi-host coordination (only one writer per shard).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from tpupose.utils.logging import printS, printT


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5, interval: int = 1):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.interval = max(int(interval), 1)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=None,
            create=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)
        self.best_metric = float("inf")
        self.best_step = -1

    @staticmethod
    def _state_tree(state) -> dict:
        return {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }

    def save(self, step: int, state, metric: Optional[float] = None, force: bool = False):
        """Periodic save; tracks best-by-metric (lower is better, matching
        the reference's best-by-train-loss policy)."""
        is_best = metric is not None and metric < self.best_metric
        if is_best:
            self.best_metric = metric
            self.best_step = step
        if force or is_best or (step % self.interval == 0):
            self._mgr.save(step, args=ocp.args.StandardSave(self._state_tree(state)))
            self._mgr.wait_until_finished()
            printT(f"checkpoint saved @ step {step}" + (" (best)" if is_best else ""))

    def restore(self, state, step: Optional[int] = None):
        """Restore into the shape/sharding of `state` (abstract target)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return state, 0
        target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                        self._state_tree(state))
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(target))
        new_state = state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
        printS(f"restored checkpoint @ step {step}")
        return new_state, int(step)

    def latest_step(self):
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()
