"""Orbax checkpointing: periodic + best, with resume.

Capability parity with the reference's three checkpoint flavors
(SURVEY.md §5.4; pose/pose/engine/trainer.py:124-133 periodic+best
model-only; HPE/engine/trainer.py:40-57 {epoch, model, optimizer}):
here every checkpoint carries {params, batch_stats, opt_state, step} so
resume is always exact, and `best.pt`-equivalent tracking is durable: the
best checkpoint lives in its own single-slot manager (directory/best) so
the periodic max_to_keep GC can never delete it, and the best metric/step
survive restarts via a small metadata file. Orbax handles multi-host
coordination (only one writer per shard).

`interval` is in EPOCHS (matching cfg.train.ckpt_interval's documentation):
callers pass the epoch index to save(); gating on the raw global step is
only a fallback for epoch-less callers.
"""

from __future__ import annotations

import json
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
            create=True,
        )
        self._mgr = ocp.CheckpointManager(
            os.path.join(self.directory, "periodic"), options=options)
        # single-slot best manager: immune to periodic GC
        self._best_mgr = ocp.CheckpointManager(
            os.path.join(self.directory, "best"),
            options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True))
        self._meta_path = os.path.join(self.directory, "best_meta.json")
        self.best_metric = float("inf")
        self.best_step = -1
        if os.path.exists(self._meta_path):
            try:
                with open(self._meta_path) as f:
                    meta = json.load(f)
                self.best_metric = float(meta.get("metric", float("inf")))
                self.best_step = int(meta.get("step", -1))
            except (ValueError, OSError):
                pass

    @staticmethod
    def _state_tree(state) -> dict:
        tree = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        # EMA weights ride along only when tracked, so checkpoints from
        # non-EMA runs keep their layout (and stay restorable)
        if getattr(state, "ema_params", None) is not None:
            tree["ema_params"] = state.ema_params
        return tree

    def save(self, step: int, state, metric: Optional[float] = None,
             force: bool = False, epoch: Optional[int] = None):
        """Periodic save gated on the epoch index (cfg ckpt_interval is in
        epochs); tracks best-by-metric (lower is better, matching the
        reference's best-by-train-loss policy) in a durable separate slot."""
        is_best = metric is not None and metric < self.best_metric
        if is_best:
            self.best_metric = float(metric)
            self.best_step = step
            self._best_mgr.save(
                step, args=ocp.args.StandardSave(self._state_tree(state)))
            self._best_mgr.wait_until_finished()
            if jax.process_index() == 0:
                with open(self._meta_path, "w") as f:
                    json.dump({"metric": self.best_metric,
                               "step": self.best_step}, f)
            printT(f"best checkpoint saved @ step {step} "
                   f"(metric {self.best_metric:.5f})")
        periodic_due = ((epoch + 1) % self.interval == 0 if epoch is not None
                        else step % self.interval == 0)
        if force or periodic_due:
            self._mgr.save(step, args=ocp.args.StandardSave(self._state_tree(state)))
            self._mgr.wait_until_finished()
            printT(f"checkpoint saved @ step {step}")

    def restore(self, state, step: Optional[int] = None, best: bool = False):
        """Restore into the shape/sharding of `state` (abstract target).
        best=True restores the durable best checkpoint."""
        mgr = self._best_mgr if best else self._mgr
        step = step if step is not None else mgr.latest_step()
        target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                        self._state_tree(state))
        if step is None:
            # pre-split flat layout (steps directly under the directory,
            # written before the periodic/best subdirectories existed)
            legacy_steps = [d for d in os.listdir(self.directory)
                            if d.isdigit()]
            if not best and legacy_steps:
                legacy = ocp.CheckpointManager(self.directory)
                lstep = legacy.latest_step()
                if lstep is not None:
                    restored = legacy.restore(
                        lstep, args=ocp.args.StandardRestore(target))
                    legacy.close()
                    new_state = state.replace(
                        step=restored["step"], params=restored["params"],
                        batch_stats=restored["batch_stats"],
                        opt_state=restored["opt_state"])
                    printS(f"restored legacy-layout checkpoint @ step {lstep}")
                    return new_state, int(lstep)
                legacy.close()
            from tpupose.utils.logging import printW

            printW(f"no checkpoint found under {self.directory}; "
                   "continuing with current (possibly random) parameters")
            return state, 0
        try:
            restored = mgr.restore(step, args=ocp.args.StandardRestore(target))
        except Exception:
            if "ema_params" not in target:
                raise
            # EMA-tracking state restoring a pre-EMA checkpoint: restore
            # without the subtree and seed the EMA from the weights
            target = {k: v for k, v in target.items() if k != "ema_params"}
            restored = mgr.restore(step, args=ocp.args.StandardRestore(target))
        new_state = state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
        if getattr(state, "ema_params", None) is not None:
            new_state = new_state.replace(
                ema_params=restored.get("ema_params", restored["params"]))
        printS(f"restored {'best ' if best else ''}checkpoint @ step {step}")
        return new_state, int(step)

    def latest_step(self):
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()
        self._best_mgr.close()


def average_checkpoints(directory: str, state, steps=None, last: int = 0):
    """SWA-style weight averaging (Izmailov et al., UAI 2018 — no
    reference-repo counterpart): restore several periodic checkpoints and
    return `state` carrying the uniform average of their params (and
    batch_stats — an approximation of SWA's BN re-estimation that is
    standard practice for pose models, where BN statistics vary little
    across late epochs).

    steps: explicit step list; default = the `last` newest periodic steps
    (all kept steps when last<=0). Returns (averaged_state, used_steps).
    The optimizer state is NOT averaged (meaningless across steps) — the
    result is a serving/eval artifact; its step is the newest used step.
    """
    import jax.numpy as jnp

    mgr = CheckpointManager(directory)
    try:
        avail = sorted(mgr._mgr.all_steps())
        if not avail:
            raise FileNotFoundError(f"no periodic checkpoints in {directory}")
        if steps is None:
            steps = avail[-last:] if last > 0 else avail
        steps = [int(s) for s in steps]
        missing = [s for s in steps if s not in avail]
        if missing:
            raise ValueError(f"steps {missing} not in {avail}")

        has_ema = getattr(state, "ema_params", None) is not None
        acc_p = acc_b = acc_e = None
        for s in steps:
            st, _ = mgr.restore(state, step=s)
            f32 = lambda t: jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, jnp.float32), t)
            p, b = f32(st.params), f32(st.batch_stats)
            if has_ema and getattr(st, "ema_params", None) is None:
                # a range spanning a pre-EMA checkpoint would otherwise
                # die inside tree_map with an opaque structure mismatch
                # (ADVICE.md r3); name the offending step instead
                raise ValueError(
                    f"checkpoint step {s} has no ema_params but the "
                    f"template state does; restrict --steps to the "
                    f"EMA-era checkpoints or average raw params by "
                    f"passing a state without ema_params")
            e = f32(st.ema_params) if has_ema else None
            if acc_p is None:
                acc_p, acc_b, acc_e = p, b, e
            else:
                add = lambda a, x: jax.tree_util.tree_map(jnp.add, a, x)
                acc_p, acc_b = add(acc_p, p), add(acc_b, b)
                acc_e = add(acc_e, e) if has_ema else None
        n = float(len(steps))
        mean = lambda acc, ref_t: jax.tree_util.tree_map(
            lambda a, ref: (a / n).astype(ref.dtype), acc, ref_t)
        out = state.replace(step=max(steps), params=mean(acc_p, state.params),
                            batch_stats=mean(acc_b, state.batch_stats))
        if has_ema:
            # EMA runs serve from ema_params: average the STORED EMA
            # weights rather than re-deriving them from averaged raw
            # params (which would silently discard the EMA trajectory)
            out = out.replace(ema_params=mean(acc_e, state.ema_params))
        printS(f"averaged {len(steps)} checkpoints {steps} from {directory}")
        return out, steps
    finally:
        mgr.close()


def restore_path(state, path: str):
    """Restore `state` from a checkpoint-directory path, honoring the
    `<dir>@best` suffix: `--ckpt out/exp/ckpt@best` loads the durable
    best-by-metric slot instead of the latest periodic step (the
    reference's best.pt vs pose_dino_epoch_N.pt split,
    pose/pose/engine/trainer.py:124-133). Returns (state, step)."""
    best = False
    if path.endswith("@best"):
        best, path = True, path[: -len("@best")]
    mgr = CheckpointManager(path)
    try:
        return mgr.restore(state, best=best)
    finally:
        mgr.close()
