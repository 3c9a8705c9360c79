"""Pallas TPU kernel: fused DARK heatmap decode.

One kernel performs the whole decode chain that ops/decode.py expresses as
separate XLA ops (separable Gaussian blur -> log -> argmax -> Taylor
refinement): each grid step loads a tile of heatmaps into VMEM once and
produces final sub-pixel coordinates — no intermediate heatmap-sized
tensors ever return to HBM.

Kernel design notes (see /opt/skills/guides/pallas_guide.md):
  - The separable blur runs as masked shift-and-add on the VPU (Mosaic
    supports only 2-D matmuls, so a banded-matmul MXU form doesn't lower;
    22 masked rolls over a VMEM-resident tile are cheap).
  - log(scale * x) = log(scale) + log(x): DARK's peak-amplitude
    renormalization is a constant shift under log and cancels in every
    derivative, so it is omitted entirely.
  - No gathers and no flattening: the argmax uses per-axis iota/min
    tricks and the five log-derivatives are evaluated densely (roll
    shifts) then read out at the peak with a one-hot contraction —
    gathers and cross-lane reshapes don't vectorize on TPU, one-hot
    reductions do.
  - Border peaks keep the raw argmax coordinate (matching the jnp
    reference path's `inner` guard).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _gauss_kernel(size: int, sigma: float) -> np.ndarray:
    xs = np.arange(-(size // 2), size // 2 + 1, dtype=np.float32)
    k = np.exp(-(xs ** 2) / (2.0 * sigma * sigma))
    return k / k.sum()


def _decode_kernel(hm_ref, coords_ref, scores_ref, *, H, W, taps):
    x = hm_ref[:]                                   # (T, H, W) fp32
    T = x.shape[0]

    # --- separable zero-padded blur as masked shift-and-add on the VPU
    # (Mosaic supports only 2-D matmuls, so the banded-matmul form is out;
    # 2*len(taps) masked rolls stay fully vectorized) -----------------------
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (T, H, W), 1)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (T, H, W), 2)
    half = len(taps) // 2

    def blur_axis(v, axis, iota, n):
        acc = jnp.zeros_like(v)
        for t, w in enumerate(taps):
            k = t - half
            shifted = v if k == 0 else jnp.roll(v, k, axis=axis)
            src = iota - k
            valid = (src >= 0) & (src < n)
            acc = acc + jnp.float32(w) * jnp.where(valid, shifted, 0.0)
        return acc

    xb = blur_axis(x, 1, row_iota, H)
    xb = blur_axis(xb, 2, col_iota, W)
    # log(scale*x) = log(scale) + log(x): amplitude renorm cancels in the
    # derivatives, so it is skipped
    l = jnp.log(jnp.maximum(xb, 1e-10))             # (T, H, W)

    # --- argmax via per-axis iota/min tricks (no flatten: Mosaic cannot
    # reshape across padded lanes) ------------------------------------------
    # per-map scalars stay (T, 1) and every reduction is single-axis —
    # Mosaic crashes on multi-axis reductions and 1-D vectors
    rowmax = jnp.max(x, axis=2)                               # (T, H)
    mx = jnp.max(rowmax, axis=1, keepdims=True)               # (T, 1)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (T, H), 1)
    py_i = jnp.min(jnp.where(rowmax >= mx, iota_h, H), axis=1,
                   keepdims=True)                             # (T, 1)
    onehot_row = (iota_h == py_i).astype(jnp.float32)         # (T, H)
    # the peak row's values, then the leftmost peak column within it
    xrow = jnp.sum(x * onehot_row[:, :, None], axis=1)        # (T, W)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
    px_i = jnp.min(jnp.where(xrow >= mx, iota_w, W), axis=1,
                   keepdims=True)                             # (T, 1)
    onehot_col = (iota_w == px_i).astype(jnp.float32)         # (T, W)
    px = px_i.astype(jnp.float32)                             # (T, 1)
    py = py_i.astype(jnp.float32)

    # --- dense log-derivatives + one-hot readout ---------------------------
    def sh(dx, dy):
        v = l
        if dx:
            v = jnp.roll(v, -dx, axis=2)
        if dy:
            v = jnp.roll(v, -dy, axis=1)
        return v

    def at_peak(v):
        vr = jnp.sum(v * onehot_col[:, None, :], axis=2)      # (T, H)
        return jnp.sum(vr * onehot_row, axis=1, keepdims=True)  # (T, 1)

    dx = 0.5 * (at_peak(sh(1, 0)) - at_peak(sh(-1, 0)))
    dy = 0.5 * (at_peak(sh(0, 1)) - at_peak(sh(0, -1)))
    c0 = at_peak(l)
    dxx = at_peak(sh(1, 0)) - 2.0 * c0 + at_peak(sh(-1, 0))
    dyy = at_peak(sh(0, 1)) - 2.0 * c0 + at_peak(sh(0, -1))
    dxy = 0.25 * (at_peak(sh(1, 1)) - at_peak(sh(1, -1))
                  - at_peak(sh(-1, 1)) + at_peak(sh(-1, -1)))

    det = dxx * dyy - dxy * dxy
    ok = jnp.abs(det) > 1e-12
    det = jnp.where(ok, det, 1.0)
    ox = jnp.clip(-(dyy * dx - dxy * dy) / det, -1.0, 1.0)
    oy = jnp.clip(-(dxx * dy - dxy * dx) / det, -1.0, 1.0)

    inner = (px >= 1) & (px <= W - 2) & (py >= 1) & (py <= H - 2)
    use = ok & inner
    cx = px + jnp.where(use, ox, 0.0)
    cy = py + jnp.where(use, oy, 0.0)
    # zero-confidence peaks -> (-1, -1), matching ops/decode.get_max_preds
    valid = mx > 0.0                                          # (T, 1)
    coords_ref[:, 0:1] = jnp.where(valid, cx, -1.0)
    coords_ref[:, 1:2] = jnp.where(valid, cy, -1.0)
    scores_ref[:, 0:1] = mx


def dark_decode_pallas(heatmaps, blur_kernel: int = 11, sigma: float = 2.0,
                       tile: int = 16, interpret: bool = False):
    """Fused DARK decode. heatmaps: (B, K, H, W) -> (coords (B, K, 2),
    scores (B, K)). Equivalent to ops.decode.decode_heatmaps(method="dark")
    up to the log-shift identity (tested)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, K, H, W = heatmaps.shape
    BK = B * K
    x = heatmaps.reshape(BK, H, W).astype(jnp.float32)
    T = min(tile, BK)
    pad = (-BK) % T
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, H, W), jnp.float32)], 0)
    n = x.shape[0] // T

    g = _gauss_kernel(blur_kernel, sigma)

    kernel = functools.partial(_decode_kernel, H=H, W=W,
                               taps=tuple(float(v) for v in g))
    coords, scores = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((T, H, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((T, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x.shape[0], 2), jnp.float32),
            jax.ShapeDtypeStruct((x.shape[0], 1), jnp.float32),
        ),
        interpret=interpret,
    )(x)
    coords = coords[:BK].reshape(B, K, 2)
    scores = scores[:BK, 0].reshape(B, K)
    return coords, scores
