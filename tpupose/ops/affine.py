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


def get_affine_matrix(center, scale, rotation_deg, out_size,
                      udp: bool = False):
    """2x3 dst->src affine matrix.

    Args:
      center: (2,) person center (x, y) in source pixels.
      scale: (2,) crop size (w, h) in source pixels (already aspect-fixed).
      rotation_deg: scalar rotation in degrees.
      out_size: static (Ho, Wo).
      udp: unbiased data processing (Huang et al., CVPR 2020): measure the
        destination grid in UNIT LENGTHS (Wo-1 intervals between Wo pixel
        centers) instead of Wo pixels, and center on the geometric grid
        center ((Wo-1)/2). Removes the systematic half-pixel-family biases
        of the classic MSRA convention — with udp the crop->heatmap->crop
        round trip and the flip-test mirror are EXACT (no 1-px shift hack).

    Returns:
      (2, 3) matrix M with src_xy = M @ [dst_x, dst_y, 1].
    """
    Ho, Wo = out_size
    theta = jnp.deg2rad(rotation_deg)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    dw, dh = (Wo - 1.0, Ho - 1.0) if udp else (float(Wo), float(Ho))
    sx = scale[0] / dw
    sy = scale[1] / dh
    # src = C + R @ diag(sx, sy) @ (dst - dst_center)
    R = jnp.array([[cos, -sin], [sin, cos]])
    A = R * jnp.stack([sx, sy])[None, :]
    dst_c = jnp.array([dw * 0.5, dh * 0.5]) if udp \
        else jnp.array([Wo * 0.5, Ho * 0.5])
    t = center - A @ dst_c
    return jnp.concatenate([A, t[:, None]], axis=1)


def get_affine_matrix_np(center, scale, rotation_deg, out_size,
                         udp: bool = False):
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
    dw, dh = (Wo - 1.0, Ho - 1.0) if udp else (float(Wo), float(Ho))
    sx = scale[0] / dw
    sy = scale[1] / dh
    R = np.array([[cos, -sin], [sin, cos]], np.float64)
    A = R * np.array([sx, sy])[None, :]
    dst_c = (np.array([dw * 0.5, dh * 0.5]) if udp
             else np.array([Wo * 0.5, Ho * 0.5]))
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


def random_affine_augment(images, joints, visibility, rng,
                          rotation_factor: float, scale_factor: float,
                          heatmap_size, rot_prob: float = 0.6,
                          udp: bool = False):
    """Random rotation/scale augmentation INSIDE the compiled train step.

    The reference (and the classic MSRA pipeline) draws scale/rotation on
    the host and folds them into the cv2 crop. Here the host ships the
    canonical (un-jittered) crop and the augmentation runs as one batched
    bilinear warp on device (north star: "on-device affine augmentation
    pipeline", BASELINE.json config 3) — fused by XLA with the normalize
    and the first conv's input pipeline.

    Parameter draws follow the host path exactly
    (tpupose/data/coco.py _sample_params): scale multiplier
    clip(1 + N(0,1)*sf, 1-sf, 1+sf); rotation clip(N(0,1)*rf, ±2rf) with
    probability 0.6, else 0.

    Geometry: crop aspect is fixed (sx == sy), so the jitter composes in
    crop space as dst->src = c + m*R(θ)·(dst − c) about the crop center;
    joints (heatmap px, same uniform scale) move by the inverse:
    j' = c_hm + R(−θ)/m · (j − c_hm). Joints leaving the heatmap get
    visibility 0 (matches the host path's inside-crop rule).

    Args:
      images: (B, H, W, C) uint8/float crop batch.
      joints: (B, K, 2) keypoint coords in heatmap pixels.
      visibility: (B, K).
      rng: PRNGKey (fold per step for deterministic resume).
      heatmap_size: static (Hh, Wh).

    Returns: (images float32, joints (B,K,2), visibility (B,K)).
    """
    B, H, W = images.shape[0], images.shape[1], images.shape[2]
    Hh, Wh = heatmap_size
    r_s, r_r, r_p = jax.random.split(rng, 3)
    mult = jnp.clip(1.0 + jax.random.normal(r_s, (B,)) * scale_factor,
                    1.0 - scale_factor, 1.0 + scale_factor)
    rot = jnp.clip(jax.random.normal(r_r, (B,)) * rotation_factor,
                   -2.0 * rotation_factor, 2.0 * rotation_factor)
    rot = jnp.where(jax.random.uniform(r_p, (B,)) < rot_prob, rot, 0.0)

    theta = jnp.deg2rad(rot)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # image warp dst->src: A = m*R(θ)  (B, 2, 2)
    A = mult[:, None, None] * jnp.stack(
        [jnp.stack([cos, -sin], -1), jnp.stack([sin, cos], -1)], -2)
    # udp: rotate about the geometric grid center (W-1)/2 (unit-length
    # convention, matching get_affine_matrix(udp=True)); classic: W/2
    c_img = (jnp.array([(W - 1) * 0.5, (H - 1) * 0.5]) if udp
             else jnp.array([W * 0.5, H * 0.5]))
    t = c_img[None, :] - jnp.einsum("bij,j->bi", A, c_img)
    mats = jnp.concatenate([A, t[..., None]], axis=-1)  # (B, 2, 3)
    # Pallas MXU warp on TPU (14x the XLA gather path), XLA elsewhere
    from tpupose.ops.pallas_warp import affine_warp_auto

    out = affine_warp_auto(images, mats, (H, W))

    # joints move by the inverse map (forward transform of content)
    inv_m = 1.0 / mult
    Ainv = inv_m[:, None, None] * jnp.stack(
        [jnp.stack([cos, sin], -1), jnp.stack([-sin, cos], -1)], -2)
    c_hm = (jnp.array([(Wh - 1) * 0.5, (Hh - 1) * 0.5]) if udp
            else jnp.array([Wh * 0.5, Hh * 0.5]))
    jnew = jnp.einsum("bij,bkj->bki", Ainv, joints - c_hm) + c_hm
    inside = ((jnew[..., 0] >= 0) & (jnew[..., 0] < Wh)
              & (jnew[..., 1] >= 0) & (jnew[..., 1] < Hh))
    vis = visibility * inside.astype(visibility.dtype)
    return out, jnew, vis


def transform_preds(coords, center, scale, heatmap_size, udp: bool = False):
    """Map heatmap-space keypoint coords back to original-image space.

    The inverse of the crop: the MSRA `transform_preds` equivalent, fully
    on device. coords: (..., 2) in heatmap pixels; center/scale as in
    get_affine_matrix; heatmap_size static (Hh, Wh).
    """
    Hh, Wh = heatmap_size
    # heatmap -> crop-relative unit -> source pixels (rotation=0 at eval)
    m = get_affine_matrix(center, scale, 0.0, (Hh, Wh), udp=udp)
    return affine_transform_points(coords, m)
