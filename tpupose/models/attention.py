"""Attention modules: vanilla MHSA and GatedAttention.

Capability parity with the reference attention kit
(reference: HPE/models/nn/modules/attention.py:1-164):
- Attention: standard multi-head self-attention (:5-30).
- GatedAttention: sigmoid gate on the SDPA output, Y' = Y (.) sigma(X W_g),
  headwise or elementwise, optional mask, optional gate-score return
  (:118-164 includes shape/grad self-tests — ours live in
  tests/test_attention_meta.py).

TPU note: uses jax.nn.dot_product_attention (fused SDPA kernel).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class Attention(nn.Module):
    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask=None):
        B, T, _ = x.shape
        h = self.num_heads
        hd = self.dim // h
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias,
                       dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, h, hd)
        k = k.reshape(B, T, h, hd)
        v = v.reshape(B, T, h, hd)
        bias = None
        if mask is not None:
            # mask: (B, T) or (B, T, T) True = attend
            if mask.ndim == 2:
                mask = mask[:, None, :] & mask[:, :, None]
            bias = jnp.where(mask[:, None, :, :], 0.0, -1e9).astype(jnp.float32)
        out = jax.nn.dot_product_attention(q, k, v, bias=bias)
        out = out.reshape(B, T, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype)(out)


class GatedAttention(nn.Module):
    """SDPA with an input-conditioned sigmoid output gate.

    gate_mode:
      - "elementwise": gate (B, T, dim)
      - "headwise": gate (B, T, heads), broadcast over head_dim
    """

    dim: int
    num_heads: int = 8
    gate_mode: str = "elementwise"
    qkv_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask=None, return_gate: bool = False):
        B, T, _ = x.shape
        h = self.num_heads
        hd = self.dim // h
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, h, hd)
        k = k.reshape(B, T, h, hd)
        v = v.reshape(B, T, h, hd)
        bias = None
        if mask is not None:
            if mask.ndim == 2:
                mask = mask[:, None, :] & mask[:, :, None]
            bias = jnp.where(mask[:, None, :, :], 0.0, -1e9).astype(jnp.float32)
        y = jax.nn.dot_product_attention(q, k, v, bias=bias)  # (B, T, h, hd)

        if self.gate_mode == "headwise":
            g = nn.Dense(h, dtype=self.dtype, name="gate")(x)       # (B, T, h)
            gate = jax.nn.sigmoid(g)[..., None]                     # (B, T, h, 1)
            y = y * gate.astype(y.dtype)
            gate_scores = gate[..., 0]
        elif self.gate_mode == "elementwise":
            g = nn.Dense(self.dim, dtype=self.dtype, name="gate")(x)
            gate = jax.nn.sigmoid(g)                                # (B, T, dim)
            y = y.reshape(B, T, self.dim) * gate.astype(y.dtype)
            gate_scores = gate
        else:
            raise ValueError(f"unknown gate_mode {self.gate_mode!r}")
        y = y.reshape(B, T, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(y)
        if return_gate:
            return out, gate_scores
        return out
