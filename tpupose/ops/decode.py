"""Fused on-device heatmap decoding: argmax + quarter-offset / DARK,
flip-test merging.

The graded configs require "argmax + quarter-offset/DARK sub-pixel decode,
flip-test averaging" as a fused on-device kernel instead of host NumPy
(BASELINE.json north star). Everything here is jit-compatible with static
shapes; the whole eval path (forward -> flip forward -> merge -> decode ->
back-projection) compiles to one XLA program.

DARK: Distribution-Aware coordinate Representation of Keypoints
(arXiv:1910.06278): modulate (blur) the heatmap, take log, and do one
Newton step at the argmax using the local gradient/Hessian.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def get_max_preds(heatmaps):
    """Argmax decode. heatmaps: (B, K, H, W) -> coords (B, K, 2) xy, maxvals (B, K).

    Equivalent of the host-side get_max_preds in MSRA stacks; the reference's
    single-stage head does its own grid decode (HPE/models/nn/modules/head.py:185-211),
    and its PCK-style metrics consume argmax coords.
    """
    B, K, H, W = heatmaps.shape
    flat = heatmaps.reshape(B, K, H * W)
    idx = jnp.argmax(flat, axis=-1)
    maxvals = jnp.max(flat, axis=-1)
    x = (idx % W).astype(jnp.float32)
    y = (idx // W).astype(jnp.float32)
    coords = jnp.stack([x, y], axis=-1)
    # convention: zero-confidence peaks get coords (-1, -1) like the MSRA mask
    coords = jnp.where((maxvals > 0.0)[..., None], coords, -1.0)
    return coords, maxvals


def _gather_hm(heatmaps, xi, yi):
    """heatmaps (B,K,H,W); xi, yi int32 of shape (B,K) or (B,K,P) — extra
    trailing candidate dims gather along the flattened map. Clamped."""
    B, K, H, W = heatmaps.shape
    xi = jnp.clip(xi, 0, W - 1)
    yi = jnp.clip(yi, 0, H - 1)
    flat = heatmaps.reshape(B, K, H * W)
    idx = yi * W + xi
    if idx.ndim == flat.ndim - 1:
        return jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
    return jnp.take_along_axis(flat, idx, axis=-1)


def quarter_offset_refine(heatmaps, coords):
    """Classic MSRA +/-0.25 px shift toward the higher neighbor.

    coords: (..., 2) integer-valued peak positions — (B, K, 2) for the
    top-down decode, (B, K, P, 2) for bottom-up per-joint candidates
    (ops/ae_decode.py); border peaks are left unshifted."""
    xi = coords[..., 0].astype(jnp.int32)
    yi = coords[..., 1].astype(jnp.int32)
    dx = _gather_hm(heatmaps, xi + 1, yi) - _gather_hm(heatmaps, xi - 1, yi)
    dy = _gather_hm(heatmaps, xi, yi + 1) - _gather_hm(heatmaps, xi, yi - 1)
    off = jnp.stack([jnp.sign(dx), jnp.sign(dy)], axis=-1) * 0.25
    H, W = heatmaps.shape[2], heatmaps.shape[3]
    inner = ((coords[..., 0] > 0) & (coords[..., 0] < W - 1)
             & (coords[..., 1] > 0) & (coords[..., 1] < H - 1))
    return coords + off * inner[..., None]


def _band_matrix(n: int, kernel: jnp.ndarray) -> jnp.ndarray:
    """(n, n) banded matrix equivalent to a zero-padded 1D convolution:
    out[i] = sum_j kernel[j] * x[i + j - half]."""
    ks = kernel.shape[0]
    half = ks // 2
    idx = jnp.arange(n)
    # row i, column i + (j - half) gets kernel[j]
    cols = idx[:, None] + (jnp.arange(ks)[None, :] - half)     # (n, ks)
    valid = (cols >= 0) & (cols < n)
    cols = jnp.clip(cols, 0, n - 1)
    m = jnp.zeros((n, n), kernel.dtype)
    rows = jnp.broadcast_to(idx[:, None], cols.shape)
    return m.at[rows, cols].add(jnp.where(valid, kernel[None, :], 0.0))


def gaussian_blur(heatmaps, kernel_size: int = 11, sigma: float = 2.0):
    """Separable Gaussian blur preserving per-map peak amplitude (DARK
    modulation). heatmaps: (B, K, H, W).

    TPU shape: a grouped conv over B*K tiny single-channel maps schedules
    terribly (thousands of 1-channel convs on the VPU); the same math as
    two banded MATMULS (blur_y @ hm @ blur_x^T) rides the MXU and is ~10x
    faster at eval batch sizes (measured on v5e; kernels are (H,H)/(W,W)
    trace-time constants)."""
    assert kernel_size % 2 == 1
    half = kernel_size // 2
    xs = jnp.arange(-half, half + 1, dtype=jnp.float32)
    k = jnp.exp(-(xs ** 2) / (2.0 * sigma * sigma))
    k = k / jnp.sum(k)
    B, K, H, W = heatmaps.shape
    hm = heatmaps.astype(jnp.float32)
    orig_max = jnp.max(hm.reshape(B, K, -1), axis=-1)
    by = _band_matrix(H, k)                                    # (H, H)
    bx = _band_matrix(W, k)                                    # (W, W)
    x = jnp.einsum("hH,bkHw->bkhw", by, hm)
    x = jnp.einsum("bkhW,wW->bkhw", x, bx)
    new_max = jnp.max(x.reshape(B, K, -1), axis=-1)
    scale = orig_max / jnp.maximum(new_max, 1e-10)
    return (x * scale[..., None, None]).astype(heatmaps.dtype)


def dark_refine(heatmaps, coords, blur_kernel: int = 11, sigma: float = 2.0):
    """DARK Taylor-expansion sub-pixel refinement at the argmax.

    One Newton step on log(blurred heatmap): offset = -H^-1 grad, with the
    2x2 Hessian solved in closed form. Border peaks fall back to no offset.
    """
    hm = gaussian_blur(heatmaps, blur_kernel, sigma)
    hm = jnp.log(jnp.maximum(hm, 1e-10))
    xi = coords[..., 0].astype(jnp.int32)
    yi = coords[..., 1].astype(jnp.int32)

    def v(dx, dy):
        return _gather_hm(hm, xi + dx, yi + dy)

    dx = 0.5 * (v(1, 0) - v(-1, 0))
    dy = 0.5 * (v(0, 1) - v(0, -1))
    dxx = v(1, 0) - 2.0 * v(0, 0) + v(-1, 0)
    dyy = v(0, 1) - 2.0 * v(0, 0) + v(0, -1)
    dxy = 0.25 * (v(1, 1) - v(1, -1) - v(-1, 1) + v(-1, -1))

    det = dxx * dyy - dxy * dxy
    ok = jnp.abs(det) > 1e-12
    det = jnp.where(ok, det, 1.0)
    # -H^-1 @ g for H=[[dxx,dxy],[dxy,dyy]]
    ox = -(dyy * dx - dxy * dy) / det
    oy = -(dxx * dy - dxy * dx) / det
    off = jnp.stack([ox, oy], axis=-1)
    off = jnp.clip(jnp.where(ok[..., None], off, 0.0), -1.0, 1.0)

    H, W = heatmaps.shape[2], heatmaps.shape[3]
    inner = ((coords[..., 0] >= 1) & (coords[..., 0] <= W - 2)
             & (coords[..., 1] >= 1) & (coords[..., 1] <= H - 2))
    return coords + off * inner[..., None]


def decode_heatmaps(heatmaps, method: str = "dark", blur_kernel: int = 11,
                    sigma: float = 2.0):
    """Full decode: (B, K, H, W) -> coords (B, K, 2) heatmap px, scores (B, K)."""
    coords, maxvals = get_max_preds(heatmaps)
    if method == "dark":
        coords = dark_refine(heatmaps, coords, blur_kernel, sigma)
    elif method == "quarter_offset":
        coords = quarter_offset_refine(heatmaps, coords)
    elif method != "argmax":
        raise ValueError(f"unknown decode method {method!r}")
    return coords, maxvals


def flip_back(flipped_heatmaps, flip_pairs, shift: bool = True):
    """Un-flip heatmaps from a horizontally-flipped forward pass.

    flipped_heatmaps: (B, K, H, W); flip_pairs: (P, 2) int array of
    left/right channel indices to swap. `shift` applies the classic
    1-pixel right shift that aligns flipped and direct predictions.
    """
    hm = flipped_heatmaps[..., ::-1]  # undo horizontal flip
    perm = jnp.arange(hm.shape[1])
    if len(flip_pairs) > 0:
        fp = jnp.asarray(flip_pairs)
        perm = perm.at[fp[:, 0]].set(fp[:, 1])
        perm = perm.at[fp[:, 1]].set(fp[:, 0])
    hm = hm[:, perm]
    if shift:
        hm = jnp.concatenate([hm[..., :1], hm[..., :-1]], axis=-1)
    return hm


def merge_flip(heatmaps, flipped_heatmaps, flip_pairs, shift: bool = True):
    """Flip-test averaging (graded HRNet-W48 config).

    shift=False under UDP (unit-length) processing: there the heatmap-axis
    reversal IS the exact mirror, so the classic 1-px alignment shift would
    itself introduce the bias it normally corrects."""
    return 0.5 * (heatmaps + flip_back(flipped_heatmaps, flip_pairs,
                                       shift=shift))


# ---------------------------------------------------------------------------
# SimCC (1D coordinate classification) decode — models/simcc.py
# ---------------------------------------------------------------------------

def _parabolic_1d(logp, idx):
    """3-point parabolic sub-bin refinement on log-probabilities.

    logp (..., N), idx (...) int argmax -> fractional offset in (-0.5, 0.5):
    the vertex of the parabola through (idx-1, idx, idx+1); clamped to 0 at
    the borders (one-sided neighborhoods are unreliable)."""
    n = logp.shape[-1]
    i0 = jnp.clip(idx - 1, 0, n - 1)
    i2 = jnp.clip(idx + 1, 0, n - 1)
    f0 = jnp.take_along_axis(logp, i0[..., None], -1)[..., 0]
    f1 = jnp.take_along_axis(logp, idx[..., None], -1)[..., 0]
    f2 = jnp.take_along_axis(logp, i2[..., None], -1)[..., 0]
    denom = f0 - 2.0 * f1 + f2
    off = jnp.where(jnp.abs(denom) > 1e-9,
                    0.5 * (f0 - f2) / jnp.where(jnp.abs(denom) > 1e-9,
                                                denom, 1.0), 0.0)
    off = jnp.clip(off, -0.5, 0.5)
    interior = (idx > 0) & (idx < n - 1)
    return jnp.where(interior, off, 0.0)


def decode_simcc(x_logits, y_logits, refine: bool = True):
    """SimCC decode: per-axis softmax -> argmax (+ parabolic sub-bin) ->
    coords in BIN units, score = sqrt(px * py) of the two axis peaks.

    x_logits (B, K, Wb), y_logits (B, K, Hb) -> coords (B, K, 2) (x, y) in
    bin coordinates (the caller back-projects with the (Hb, Wb) grid, same
    affine convention as heatmap decode), scores (B, K).
    """
    px = jax.nn.softmax(x_logits.astype(jnp.float32), axis=-1)
    py = jax.nn.softmax(y_logits.astype(jnp.float32), axis=-1)
    xi = jnp.argmax(px, -1)
    yi = jnp.argmax(py, -1)
    x = xi.astype(jnp.float32)
    y = yi.astype(jnp.float32)
    if refine:
        x = x + _parabolic_1d(jnp.log(jnp.maximum(px, 1e-12)), xi)
        y = y + _parabolic_1d(jnp.log(jnp.maximum(py, 1e-12)), yi)
    sx = jnp.take_along_axis(px, xi[..., None], -1)[..., 0]
    sy = jnp.take_along_axis(py, yi[..., None], -1)[..., 0]
    return jnp.stack([x, y], -1), jnp.sqrt(sx * sy)


def simcc_flip_back(x_logits_f, y_logits_f, flip_pairs, shift_bins: int = 0):
    """Un-flip SimCC logits from a horizontally-flipped forward: reverse
    the x-bin axis, shift, and swap left/right keypoint channels (y
    unchanged in space, channels swapped).

    `shift_bins` removes the systematic flip bias: with the crop->bin
    convention u = r*p (r = split_ratio; follows from get_affine_matrix's
    center/scale form with the SAME center/scale for crop and bin grid),
    a pixel-mirrored crop (p -> W-1-p) puts mass at u_f = rW - r - r*p,
    and plain axis reversal lands at Wb-1-u_f = r*p + (r-1) — biased by
    (r-1) bins. Shifting LEFT by r-1 bins cancels it EXACTLY for integer
    r (unlike the heatmap grid's classic 1-px shift, which leaves a
    +-1/4 px residual). Callers pass shift_bins = round(r) - 1."""
    xl = x_logits_f[..., ::-1]
    if shift_bins > 0:
        pad = jnp.repeat(xl[..., -1:], shift_bins, axis=-1)
        xl = jnp.concatenate([xl[..., shift_bins:], pad], axis=-1)
    perm = jnp.arange(xl.shape[1])
    if len(flip_pairs) > 0:
        fp = jnp.asarray(flip_pairs)
        perm = perm.at[fp[:, 0]].set(fp[:, 1])
        perm = perm.at[fp[:, 1]].set(fp[:, 0])
    return xl[:, perm], y_logits_f[:, perm]
