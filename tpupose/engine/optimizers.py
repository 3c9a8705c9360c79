"""Optimizer registry over optax.

Capability parity with the reference's registry of 13 thin torch-optimizer
subclasses (reference: pose/pose/core/optimizer/torch.py:3-81 and the
OPTIMEZERS name map in its __init__). Also provides:

- two param groups with separate lrs (head vs backbone), the analog of the
  reference's cv3/cv4-name lr split (HPE/train.py:39-55);
- frozen-parameter masking — the JAX answer to DDP
  find_unused_parameters=True on a frozen backbone
  (pose/pose/core/builder.py:101): frozen leaves simply get zero updates
  and are excluded from weight decay;
- global-norm gradient clipping (reference clips at 10.0,
  HPE/train.py:133).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import optax

from tpupose.configs.default import OptimizerConfig


def _wrap(fn):
    return fn


OPTIMIZERS: dict[str, Callable] = {
    "sgd": lambda lr, cfg: optax.sgd(lr, momentum=cfg.momentum, nesterov=False),
    "nesterov": lambda lr, cfg: optax.sgd(lr, momentum=cfg.momentum, nesterov=True),
    "adam": lambda lr, cfg: optax.adam(lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps),
    "adamw": lambda lr, cfg: optax.adamw(lr, b1=cfg.betas[0], b2=cfg.betas[1],
                                         eps=cfg.eps, weight_decay=cfg.weight_decay),
    "adamax": lambda lr, cfg: optax.adamax(lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps),
    "adamaxw": lambda lr, cfg: optax.adamaxw(lr, weight_decay=cfg.weight_decay),
    "nadam": lambda lr, cfg: optax.nadam(lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps),
    "nadamw": lambda lr, cfg: optax.nadamw(lr, weight_decay=cfg.weight_decay),
    "radam": lambda lr, cfg: optax.radam(lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps),
    "rmsprop": lambda lr, cfg: optax.rmsprop(lr, momentum=cfg.momentum, eps=cfg.eps),
    "adagrad": lambda lr, cfg: optax.adagrad(lr, eps=cfg.eps),
    "adadelta": lambda lr, cfg: optax.adadelta(lr, eps=cfg.eps),
    "lamb": lambda lr, cfg: optax.lamb(lr, weight_decay=cfg.weight_decay),
    "lars": lambda lr, cfg: optax.lars(lr, weight_decay=cfg.weight_decay),
    "lion": lambda lr, cfg: optax.lion(lr, weight_decay=cfg.weight_decay),
    "fromage": lambda lr, cfg: optax.fromage(lr),
    "yogi": lambda lr, cfg: optax.yogi(lr),
}


def make_optimizer(
    cfg: OptimizerConfig,
    schedule=None,
    head_schedule=None,
    params=None,
    is_head: Optional[Callable[[tuple], bool]] = None,
    is_frozen: Optional[Callable[[tuple], bool]] = None,
    grad_clip_norm: float = 0.0,
    grad_accum_steps: int = 1,
) -> optax.GradientTransformation:
    """Build the optax chain.

    `is_head(path)` / `is_frozen(path)` are predicates over flax param paths
    (tuples of str). When `is_head` is given (and `params` to derive labels),
    the head group uses `head_schedule` (or cfg.head_lr), the rest the base
    schedule — the HPE/train.py:39-55 two-group split. Frozen paths get
    set_to_zero (the stop_gradient/optimizer-side half of backbone
    freezing; see SimpleBaseline/DINOv3Pose `freeze_backbone`).
    """
    name = cfg.name.lower()
    if name not in OPTIMIZERS:
        raise ValueError(f"unknown optimizer {cfg.name!r}; have {sorted(OPTIMIZERS)}")

    base_lr = schedule if schedule is not None else cfg.lr
    head_lr = head_schedule if head_schedule is not None else cfg.head_lr

    def tx_for(lr):
        return OPTIMIZERS[name](lr, cfg)

    if params is not None and (is_head is not None or is_frozen is not None):
        def label(path, _leaf):
            p = tuple(str(getattr(k, "key", k)) for k in path)
            if is_frozen is not None and is_frozen(p):
                return "frozen"
            if is_head is not None and is_head(p):
                return "head"
            return "base"

        labels = jax.tree_util.tree_map_with_path(label, params)
        tx = optax.multi_transform(
            {"base": tx_for(base_lr), "head": tx_for(head_lr),
             "frozen": optax.set_to_zero()},
            labels,
        )
    else:
        tx = tx_for(base_lr)

    if grad_clip_norm and grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    if grad_accum_steps and grad_accum_steps > 1:
        # gradient accumulation (the reference's mini_batch_count,
        # HPE/engine/trainer.py:96-100)
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx
