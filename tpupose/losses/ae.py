"""Associative Embedding for bottom-up multi-person pose.

The reference covers the bottom-up side of the 2D-HPE taxonomy only as a
survey (study/; its code nests DeepPose under
HPE/models/reference/bottom_up/) — this module supplies the canonical
bottom-up training objective (Newell et al., NeurIPS 2017, as used by
HigherHRNet): one heatmap + one scalar tag map per joint, multi-person
Gaussian targets composed by max, and the push/pull grouping loss over
tags gathered at GT joint locations.

TPU design:
- Targets render on device from the padded (B, M, K, 3) instance tensor
  (the same static yolo-pose batch contract): a lax.scan over the M
  instance slots accumulates an elementwise max of single-person Gaussian
  surfaces — memory stays at one (B, K, H, W) buffer regardless of M.
- Tag gathering is a batched take_along_axis over the flattened map; the
  pull/push terms are dense (B, M)/(B, M, M) reductions under the
  instance mask — no ragged person lists, no host round trips. The whole
  loss jits into the model's forward/backward program.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from tpupose.ops.heatmap import gaussian_heatmaps


def multi_person_heatmaps(keypoints, instance_mask, heatmap_size,
                          sigma: float = 2.0):
    """Render bottom-up targets: max over instances of per-person Gaussians.

    keypoints: (B, M, K, 3) normalized (x, y, vis); instance_mask: (B, M).
    Returns (B, H, W, K) targets (NHWK, matching the head's NHWC output).
    """
    H, W = heatmap_size
    scale = jnp.array([W, H], jnp.float32)
    joints = keypoints[..., :2].astype(jnp.float32) * scale  # (B, M, K, 2)
    vis = keypoints[..., 2] * instance_mask[..., None]       # (B, M, K)

    def body(acc, inp):
        j, v = inp  # (B, K, 2), (B, K)
        hm, _ = gaussian_heatmaps(j, v, (H, W), sigma)       # (B, K, H, W)
        return jnp.maximum(acc, hm), None

    init = jnp.zeros((keypoints.shape[0], keypoints.shape[2], H, W),
                     jnp.float32)
    target, _ = lax.scan(body, init,
                         (jnp.swapaxes(joints, 0, 1),
                          jnp.swapaxes(vis, 0, 1)))
    return jnp.transpose(target, (0, 2, 3, 1))               # NHWK


def gather_tags(tags, keypoints, instance_mask):
    """Tag values at (rounded) GT joint pixels.

    tags: (B, H, W, K); keypoints: (B, M, K, 3) normalized.
    Returns (tag_vals (B, M, K), valid (B, M, K)).
    """
    B, H, W, K = tags.shape
    scale = jnp.array([W, H], jnp.float32)
    j = keypoints[..., :2].astype(jnp.float32) * scale
    xr = jnp.round(j[..., 0])
    yr = jnp.round(j[..., 1])
    xi = jnp.clip(xr.astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(yr.astype(jnp.int32), 0, H - 1)
    idx = yi * W + xi                                        # (B, M, K)
    flat = tags.reshape(B, H * W, K)
    flat = jnp.swapaxes(flat, 1, 2)                          # (B, K, HW)
    vals = jnp.take_along_axis(flat, jnp.swapaxes(idx, 1, 2), axis=2)
    vals = jnp.swapaxes(vals, 1, 2)                          # (B, M, K)
    # off-map joints (rounded pixel outside the grid) are excluded, like
    # the heatmap target's weight mask — otherwise the clamp above pulls
    # an arbitrary border-pixel tag into the person mean
    in_map = (xr >= 0) & (xr <= W - 1) & (yr >= 0) & (yr <= H - 1)
    valid = (keypoints[..., 2] > 0) & (instance_mask[..., None] > 0) & in_map
    return vals, valid.astype(jnp.float32)


def ae_grouping_loss(tags, keypoints, instance_mask, tag_sigma: float = 1.0):
    """Newell push/pull over reference embeddings.

    pull: joints of a person toward the person's mean tag h_m;
    push: exp(-(h_m - h_n)^2 / (2 sigma^2)) between distinct persons.
    Both are exact masked means over the padded instance slots.
    """
    t, v = gather_tags(tags, keypoints, instance_mask)       # (B, M, K)
    cnt = jnp.sum(v, axis=-1)                                # (B, M)
    person = cnt > 0
    h = jnp.sum(t * v, axis=-1) / jnp.maximum(cnt, 1.0)      # (B, M) means

    pull_per = jnp.sum(((t - h[..., None]) ** 2) * v, axis=-1) \
        / jnp.maximum(cnt, 1.0)                              # (B, M)
    n_person = jnp.sum(person.astype(jnp.float32))
    pull = jnp.sum(pull_per * person) / jnp.maximum(n_person, 1.0)

    d2 = (h[:, :, None] - h[:, None, :]) ** 2                # (B, M, M)
    pair = (person[:, :, None] & person[:, None, :])
    eye = jnp.eye(keypoints.shape[1], dtype=bool)[None]
    pair = pair & ~eye
    n_pair = jnp.sum(pair.astype(jnp.float32))
    push = jnp.sum(jnp.exp(-d2 / (2.0 * tag_sigma ** 2)) * pair) \
        / jnp.maximum(n_pair, 1.0)
    return pull, push


def ae_loss(pred, keypoints, instance_mask, *, sigma: float = 2.0,
            tag_sigma: float = 1.0, pull_weight: float = 1e-3,
            push_weight: float = 1e-3, heatmap_weight: float = 1.0):
    """Combined bottom-up objective on a (B, H, W, 2K) prediction.

    Channels [0:K] are heatmaps, [K:2K] tags. Returns (loss, parts dict).
    """
    K = pred.shape[-1] // 2
    hm = pred[..., :K].astype(jnp.float32)
    tags = pred[..., K:].astype(jnp.float32)
    target = multi_person_heatmaps(keypoints, instance_mask,
                                   (pred.shape[1], pred.shape[2]), sigma)
    # masked row mean: rows whose instance_mask is all zero are padding
    # (Trainer.validate's pad_last contract zeroes the duplicate rows' mask
    # and relies on the loss excluding them) — an unmasked jnp.mean would
    # charge a padded row mean(hm^2) against its all-zero rendered target
    row = (jnp.sum(instance_mask, axis=1) > 0).astype(jnp.float32)   # (B,)
    per_row = jnp.mean((hm - target) ** 2, axis=(1, 2, 3))           # (B,)
    hm_loss = jnp.sum(per_row * row) / jnp.maximum(jnp.sum(row), 1.0)
    pull, push = ae_grouping_loss(tags, keypoints, instance_mask, tag_sigma)
    loss = (heatmap_weight * hm_loss + pull_weight * pull
            + push_weight * push)
    return loss, {"hm_loss": hm_loss, "pull": pull, "push": push}
