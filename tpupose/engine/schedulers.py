"""LR schedule registry over optax (per-step schedules).

Capability parity with the reference's registry of 7 torch schedulers
(reference: pose/pose/core/scheduler/torch.py:3-44) plus the trainer's
linear warmup-epochs behavior (pose/pose/engine/trainer.py:104-110,
HPE/train.py:94-103). Torch schedulers step per-epoch; here schedules are
pure functions of the global step (the JAX idiom), with warmup fused in.
"""

from __future__ import annotations

import optax

from tpupose.configs.default import SchedulerConfig


def _cosine(cfg: SchedulerConfig, base_lr, total_steps):
    return optax.cosine_decay_schedule(base_lr, max(total_steps, 1),
                                       alpha=cfg.min_lr / max(base_lr, 1e-12))


def _step(cfg: SchedulerConfig, base_lr, total_steps, steps_per_epoch=1):
    return optax.exponential_decay(base_lr, cfg.step_size * steps_per_epoch,
                                   cfg.gamma, staircase=True)


def _multistep(cfg: SchedulerConfig, base_lr, total_steps, steps_per_epoch=1):
    boundaries = {int(m * steps_per_epoch): cfg.gamma for m in cfg.milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def _exponential(cfg: SchedulerConfig, base_lr, total_steps, steps_per_epoch=1):
    return optax.exponential_decay(base_lr, max(steps_per_epoch, 1), cfg.gamma)


def _linear(cfg: SchedulerConfig, base_lr, total_steps, steps_per_epoch=1):
    return optax.linear_schedule(base_lr, cfg.min_lr, max(total_steps, 1))

def _constant(cfg: SchedulerConfig, base_lr, total_steps, steps_per_epoch=1):
    return optax.constant_schedule(base_lr)


def _onecycle(cfg: SchedulerConfig, base_lr, total_steps, steps_per_epoch=1):
    return optax.cosine_onecycle_schedule(max(total_steps, 1), base_lr)


SCHEDULERS = {
    "cosine": _cosine,
    "step": _step,
    "multistep": _multistep,
    "exponential": _exponential,
    "linear": _linear,
    "constant": _constant,
    "onecycle": _onecycle,
}


def make_schedule(cfg: SchedulerConfig, base_lr: float, total_steps: int,
                  warmup_steps: int = 0, steps_per_epoch: int = 1):
    """Schedule(step) -> lr, with linear warmup from 0 prepended."""
    name = cfg.name.lower()
    if name not in SCHEDULERS:
        raise ValueError(f"unknown scheduler {cfg.name!r}; have {sorted(SCHEDULERS)}")
    if name in ("cosine", "linear", "onecycle"):
        main = SCHEDULERS[name](cfg, base_lr, max(total_steps - warmup_steps, 1))
    else:
        main = SCHEDULERS[name](cfg, base_lr, total_steps, steps_per_epoch)
    if warmup_steps > 0:
        warm = optax.linear_schedule(0.0, base_lr, warmup_steps)
        return optax.join_schedules([warm, main], [warmup_steps])
    return main
