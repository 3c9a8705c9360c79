"""On-device affine crop/warp for top-down pose.

The reference pipeline does person-box affine crops on the host with
cv2.warpAffine (BASELINE.json north star; the reference's own preprocessing
is host cv2.resize, HPE/test.py:16-29, HPE/dataset.py:61-65). Here the warp
is a pure-XLA gather+bilinear kernel that runs on TPU, vmapped over the
batch, so the host only ships uint8 pixels.

Conventions match the MSRA SimpleBaseline `get_affine_transform`:
dst center = (Wo/2, Ho/2), rotation about the person center, zero fill
outside the source image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_affine_matrix(center, scale, rotation_deg, out_size):
    """2x3 dst->src affine matrix.

    Args:
      center: (2,) person center (x, y) in source pixels.
      scale: (2,) crop size (w, h) in source pixels (already aspect-fixed).
      rotation_deg: scalar rotation in degrees.
      out_size: static (Ho, Wo).

    Returns:
      (2, 3) matrix M with src_xy = M @ [dst_x, dst_y, 1].
    """
    Ho, Wo = out_size
    theta = jnp.deg2rad(rotation_deg)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    sx = scale[0] / Wo
    sy = scale[1] / Ho
    # src = C + R @ diag(sx, sy) @ (dst - dst_center)
    R = jnp.array([[cos, -sin], [sin, cos]])
    A = R * jnp.stack([sx, sy])[None, :]
    dst_c = jnp.array([Wo * 0.5, Ho * 0.5])
    t = center - A @ dst_c
    return jnp.concatenate([A, t[:, None]], axis=1)


def get_affine_matrix_np(center, scale, rotation_deg, out_size):
    """Pure-NumPy twin of get_affine_matrix for the HOST data path.

    Dataset __getitem__ must never dispatch device ops: one tiny jnp call
    per sample costs a full device round-trip (catastrophic through a TPU
    tunnel — measured 115 ms/sample in bench config 2 before this).
    Numerically identical to the jax version (tests/test_ops_affine.py).
    """
    import numpy as np

    Ho, Wo = out_size
    theta = np.deg2rad(rotation_deg)
    cos, sin = np.cos(theta), np.sin(theta)
    sx = scale[0] / Wo
    sy = scale[1] / Ho
    R = np.array([[cos, -sin], [sin, cos]], np.float64)
    A = R * np.array([sx, sy])[None, :]
    dst_c = np.array([Wo * 0.5, Ho * 0.5])
    t = np.asarray(center, np.float64) - A @ dst_c
    return np.concatenate([A, t[:, None]], axis=1).astype(np.float32)


def affine_warp(image, matrix, out_size):
    """Warp one image (H, W, C) by a dst->src matrix to (Ho, Wo, C).

    Bilinear sampling with zero fill outside the source. Float32 in/out;
    feed uint8 and cast outside (or use normalize_images first).
    """
    H, W = image.shape[0], image.shape[1]
    Ho, Wo = out_size
    ys = jax.lax.broadcasted_iota(jnp.float32, (Ho, Wo), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (Ho, Wo), 1)
    src_x = matrix[0, 0] * xs + matrix[0, 1] * ys + matrix[0, 2]
    src_y = matrix[1, 0] * xs + matrix[1, 1] * ys + matrix[1, 2]

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    wx = src_x - x0
    wy = src_y - y0

    img = image.astype(jnp.float32)

    def g(yi, xi):
        valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        return img[yi_c, xi_c] * valid[..., None]

    v00 = g(y0, x0)
    v01 = g(y0, x0 + 1)
    v10 = g(y0 + 1, x0)
    v11 = g(y0 + 1, x0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def batched_affine_warp(images, matrices, out_size):
    """vmap of affine_warp over the batch: (B,H,W,C),(B,2,3) -> (B,Ho,Wo,C)."""
    return jax.vmap(lambda im, m: affine_warp(im, m, out_size))(images, matrices)


def affine_transform_points(points, matrix):
    """Apply a 2x3 affine to (..., 2) points."""
    x = points[..., 0]
    y = points[..., 1]
    nx = matrix[0, 0] * x + matrix[0, 1] * y + matrix[0, 2]
    ny = matrix[1, 0] * x + matrix[1, 1] * y + matrix[1, 2]
    return jnp.stack([nx, ny], axis=-1)


def invert_affine(matrix):
    """Invert a 2x3 affine (src->dst given dst->src)."""
    A = matrix[:, :2]
    t = matrix[:, 2]
    Ainv = jnp.linalg.inv(A)
    tinv = -Ainv @ t
    return jnp.concatenate([Ainv, tinv[:, None]], axis=1)


def transform_preds(coords, center, scale, heatmap_size):
    """Map heatmap-space keypoint coords back to original-image space.

    The inverse of the crop: the MSRA `transform_preds` equivalent, fully
    on device. coords: (..., 2) in heatmap pixels; center/scale as in
    get_affine_matrix; heatmap_size static (Hh, Wh).
    """
    Hh, Wh = heatmap_size
    # heatmap -> crop-relative unit -> source pixels (rotation=0 at eval)
    m = get_affine_matrix(center, scale, 0.0, (Hh, Wh))
    return affine_transform_points(coords, m)
