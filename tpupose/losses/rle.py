"""Residual Log-likelihood Estimation (RLE) for coordinate regression.

Extends the reference's regression family (DeepPose,
reference: HPE/models/reference/bottom_up/regression/models/DeepPose.py:4-27
+ the keypoint-loss registry HPE/loss.py:29-222) with the RLE formulation
(Li et al., ICCV 2021): the head predicts a per-joint (mu, sigma) and the
loss is the negative log-likelihood of the ground truth under a learned
residual distribution — a small RealNVP normalizing flow over the
sigma-normalized 2D error, plus an analytic Laplace/Gaussian residual term.

TPU design: the flow is a few tiny Dense layers over (N, 2) residual
vectors — pure MXU-friendly matmuls, fully batched over B*K joints, no
data-dependent control flow; it jits into the same program as the model
forward/backward.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class _Coupling(nn.Module):
    """One RealNVP affine coupling over 2D vectors: the `keep` coordinate
    conditions a scale/shift of the other coordinate."""

    keep: int  # 0 or 1: which coordinate passes through unchanged
    hidden: int = 64

    @nn.compact
    def __call__(self, z):
        a = z[:, self.keep:self.keep + 1]
        b = z[:, 1 - self.keep:2 - self.keep]
        h = nn.tanh(nn.Dense(self.hidden, dtype=jnp.float32)(a))
        h = nn.tanh(nn.Dense(self.hidden, dtype=jnp.float32)(h))
        s = nn.tanh(nn.Dense(1, dtype=jnp.float32,
                             kernel_init=nn.initializers.zeros)(h))
        t = nn.Dense(1, dtype=jnp.float32,
                     kernel_init=nn.initializers.zeros)(h)
        b = b * jnp.exp(s) + t
        out = jnp.concatenate([a, b] if self.keep == 0 else [b, a], axis=-1)
        return out, s[:, 0]


class RealNVP(nn.Module):
    """Tiny normalizing flow over 2D residuals: `layers` alternating
    couplings, standard-normal base. log_prob is exact (sum of coupling
    log-dets + base density)."""

    layers: int = 3
    hidden: int = 64

    @nn.compact
    def __call__(self, r):
        """r: (N, 2) residuals -> (N,) log-density."""
        z = r.astype(jnp.float32)
        logdet = jnp.zeros(z.shape[0], jnp.float32)
        for i in range(self.layers):
            z, s = _Coupling(keep=i % 2, hidden=self.hidden)(z)
            logdet = logdet + s
        base = -0.5 * jnp.sum(z ** 2, axis=-1) - math.log(2 * math.pi)
        return base + logdet


def rle_loss(mu, sigma, log_phi, target, visibility=None, *,
             residual: bool = True, q: str = "laplace"):
    """RLE negative log-likelihood.

    mu, sigma, target: (B, K, 2); log_phi: (B, K) flow log-density of the
    sigma-normalized error; visibility: (B, K) weights. With
    `residual=True` the analytic Q-distribution term is added (the paper's
    residual decomposition); q selects Laplace (default) or Gaussian.
    """
    sigma = sigma.astype(jnp.float32)
    error = (target.astype(jnp.float32) - mu.astype(jnp.float32)) / (sigma + 1e-9)
    # flow term: log sigma (change of variables) minus flow density
    nll = jnp.sum(jnp.log(sigma + 1e-9), axis=-1) - log_phi  # (B, K)
    if residual:
        if q == "laplace":
            q_nll = jnp.log(2.0 * sigma + 1e-9) + jnp.abs(error)
        elif q == "gaussian":
            q_nll = (jnp.log(sigma * math.sqrt(2 * math.pi) + 1e-9)
                     + 0.5 * error ** 2)
        else:
            raise ValueError(f"unknown q distribution {q!r}")
        nll = nll + jnp.sum(q_nll, axis=-1)
    if visibility is not None:
        w = visibility.astype(jnp.float32)
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(nll)
