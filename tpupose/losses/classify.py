"""Classification losses: VarifocalLoss, FocalLoss (binary/multi-class/
multi-label), cross-entropy, BCE.

Capability parity with the reference (VarifocalLoss HPE/loss.py:9-27 and
pose/pose/core/loss_fn/classify/pose.py:5-23; unified FocalLoss
HPE/core/loss/focal.py:36-158; CrossEntropy HPE/core/loss/ce.py).
All computed in fp32 regardless of input dtype (the reference pins fp32
under autocast for VFL).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def binary_cross_entropy_with_logits(logits, targets):
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def varifocal_loss(pred_logits, gt_score, label_mask, alpha: float = 0.75,
                   gamma: float = 2.0):
    """IoU-aware classification loss (VarifocalNet).

    pred_logits: (...,) raw logits; gt_score: (...,) soft quality targets
    (the detached CIoU scores in the reference, HPE/loss.py:426-435);
    label_mask: (...,) 1 where the cell is a positive for that class.
    Returns elementwise loss (reduce outside).
    """
    p = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    gt_score = gt_score.astype(jnp.float32)
    label_mask = label_mask.astype(jnp.float32)
    weight = alpha * jnp.power(p, gamma) * (1.0 - label_mask) + gt_score * label_mask
    return binary_cross_entropy_with_logits(pred_logits, gt_score) * weight


def focal_loss(pred_logits, targets, alpha: float = 0.25, gamma: float = 2.0):
    """Binary focal loss on logits; targets in {0,1} (elementwise)."""
    p = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    ce = binary_cross_entropy_with_logits(pred_logits, t)
    p_t = p * t + (1 - p) * (1 - t)
    a_t = alpha * t + (1 - alpha) * (1 - t)
    return a_t * jnp.power(1 - p_t, gamma) * ce


def multiclass_focal_loss(logits, labels, alpha=None, gamma: float = 2.0):
    """Softmax focal loss. logits (N, C), labels (N,) int; alpha optional (C,)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    p = jnp.exp(-nll)
    w = jnp.power(1 - p, gamma)
    if alpha is not None:
        w = w * jnp.asarray(alpha)[labels]
    return w * nll


def cross_entropy(logits, labels, label_smoothing: float = 0.0):
    """Softmax CE with optional label smoothing. logits (N, C), labels (N,)."""
    logits = logits.astype(jnp.float32)
    C = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, C)
    if label_smoothing > 0:
        onehot = onehot * (1 - label_smoothing) + label_smoothing / C
    return -jnp.sum(onehot * logp, axis=-1)
