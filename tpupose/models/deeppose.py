"""DeepPose — direct coordinate regression baseline (+ RLE variant).

Capability parity with the reference DeepPose
(reference: HPE/models/reference/bottom_up/regression/models/DeepPose.py:4-27):
timm resnet50 backbone + fc -> 2K outputs reshaped (B, 2, K). Here the
backbone comes from the native ResNet family (the timm role per
SURVEY.md §2.9) and the output is (B, K, 2) (kpt-last, consistent with the
rest of the framework).

`rle=True` upgrades the head to Residual Log-likelihood Estimation
(losses/rle.py): the fc predicts (mu, sigma) per joint and a small RealNVP
flow models the residual density. Forward-only calls return (mu, sigma);
passing `target` additionally returns the flow log-density of the
sigma-normalized error, so the whole NLL jits into one program."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from tpupose.losses.rle import RealNVP
from tpupose.models.backbones.resnet import ResNet
from tpupose.models.heads import RegressionHead


class DeepPose(nn.Module):
    backbone: str = "resnet50"
    num_keypoints: int = 17
    rle: bool = False
    flow_layers: int = 3
    dtype: Any = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True, target=None):
        f = ResNet.from_name(self.backbone, dtype=self.dtype,
                             remat=self.remat)(x, train=train)
        if not self.rle:
            return RegressionHead(self.num_keypoints, dtype=self.dtype)(f, train)
        B = x.shape[0]
        K = self.num_keypoints
        f = jnp.mean(f, axis=(1, 2))  # GAP
        # zero-init: mu starts at 0 and sigma at sigmoid(0)=0.5, so the
        # initial NLL is O(1) — a default-init Dense on deep features puts
        # |mu| in the tens, and the sigma-normalized error explodes the
        # flow NLL (diverges under rmsprop; verified in the CLI drive)
        out = nn.Dense(4 * K, dtype=jnp.float32, name="rle_head",
                       kernel_init=nn.initializers.zeros)(f)
        mu = out[:, :2 * K].reshape(B, K, 2)
        # sigma in (0, 1): coords are normalized, so the scale is bounded
        sigma = nn.sigmoid(out[:, 2 * K:]).reshape(B, K, 2)
        flow = RealNVP(layers=self.flow_layers, name="flow")
        if target is None:
            # forward-only trace (init/eval): register the flow params so
            # the train step's apply finds them in the same tree
            _ = flow(jnp.zeros((1, 2), jnp.float32))
            return mu, sigma
        error = (target.astype(jnp.float32) - mu) / (sigma + 1e-9)
        log_phi = flow(error.reshape(B * K, 2)).reshape(B, K)
        return mu, sigma, log_phi
