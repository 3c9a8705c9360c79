"""On-device mosaic augmentation (ops/mosaic.py, data.mosaic_prob).

The load-bearing property is image/label lockstep: after the mosaic, the
pixels at every transformed keypoint must still show the source content
that was there before. Sources get distinctive solid colors so this is
directly checkable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpupose.ops.mosaic import mosaic_augment

H = W = 64
M, K = 16, 3  # M slots sized to hold a 4-source merge without overflow


def _batch(B=4, n_valid=(2, 1, 3, 2), m=M):
    rs = np.random.RandomState(0)
    images = np.zeros((B, H, W, 3), np.uint8)
    for i in range(B):
        images[i] = (i + 1) * 60  # solid color identifies the source
    boxes = np.zeros((B, m, 4), np.float32)
    classes = np.zeros((B, m), np.int32)
    kpts = np.zeros((B, m, K, 3), np.float32)
    mask = np.zeros((B, m), np.float32)
    for i in range(B):
        for j in range(n_valid[i]):
            x0, y0 = rs.uniform(5, 30, 2)
            boxes[i, j] = (x0, y0, x0 + 20, y0 + 20)
            kpts[i, j, :, 0] = rs.uniform(x0, x0 + 20, K)
            kpts[i, j, :, 1] = rs.uniform(y0, y0 + 20, K)
            kpts[i, j, :, 2] = 2.0
            mask[i, j] = 1.0
    return (jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(classes),
            jnp.asarray(kpts), jnp.asarray(mask))


def test_identity_when_prob_zero():
    images, boxes, classes, kpts, mask = _batch()
    out = mosaic_augment(images, boxes, classes, kpts, mask,
                         jax.random.PRNGKey(0), prob=0.0)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(images))
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(boxes))
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(kpts))
    np.testing.assert_allclose(np.asarray(out[4]), np.asarray(mask))
    assert float(out[5]) == 0.0


def test_mosaic_composes_four_sources_and_keeps_labels_in_lockstep():
    images, boxes, classes, kpts, mask = _batch()
    fn = jax.jit(lambda *a: mosaic_augment(*a, jax.random.PRNGKey(3),
                                           prob=1.0))
    o_img, o_box, o_cls, o_kp, o_mk, dropped = fn(images, boxes, classes,
                                                  kpts, mask)
    o_img, o_box, o_kp, o_mk = map(np.asarray, (o_img, o_box, o_kp, o_mk))
    assert o_img.shape == (4, H, W, 3) and o_img.dtype == np.uint8

    for i in range(4):
        # composed canvas shows >= 2 distinct source colors (centers are
        # in [0.35, 0.65], so every quadrant is non-empty)
        colors = set(np.unique(o_img[i, :, :, 0]).tolist())
        assert len(colors & {60, 120, 180, 240}) >= 2

        # every surviving instance: the pixel under each keypoint carries
        # a solid source color, and box/kpts stay inside the canvas
        for j in range(M):  # noqa: B007
            if o_mk[i, j] < 0.5:
                continue
            assert (o_box[i, j] >= -1).all()
            assert o_box[i, j, 2] <= W + 1 and o_box[i, j, 3] <= H + 1
            for k in range(K):
                x, y = o_kp[i, j, k, :2]
                assert -1 <= x <= W + 1 and -1 <= y <= H + 1
                px = o_img[i, int(np.clip(round(y), 0, H - 1)),
                           int(np.clip(round(x), 0, W - 1)), 0]
                # keypoint still sits on SOME source's solid color (never
                # on the 0-colored void that would indicate a bad warp)
                assert px in (60, 120, 180, 240), (i, j, k, px)
                # visibility untouched
                assert o_kp[i, j, k, 2] == 2.0

    # instance accounting: every mosaic merges at most 2+1+3+2=8 valid
    # instances, which fit the 16 slots -> nothing real is dropped
    assert float(dropped) == 0.0
    # each output image merged instances from its 4 quadrant sources; at
    # least one image must now carry MORE instances than it started with
    assert (o_mk.sum(1) >= np.asarray(mask).sum(1)).any()


def test_keypoint_color_matches_its_own_source():
    """Stronger lockstep: per-instance, the color under the keypoint must
    match the instance's own source image (tracked via `classes` used as
    a source tag)."""
    images, boxes, _, kpts, mask = _batch()
    tag = jnp.broadcast_to(jnp.arange(4, dtype=jnp.float32)[:, None], (4, M))

    o = mosaic_augment(images, boxes, tag, kpts, mask,
                       jax.random.PRNGKey(11), prob=1.0)
    o_img, _, o_tag, o_kp, o_mk, _ = map(np.asarray, o)
    for i in range(4):
        for j in range(M):
            if o_mk[i, j] < 0.5:
                continue
            src_color = (int(o_tag[i, j]) + 1) * 60
            x, y = o_kp[i, j, 0, :2]
            px = o_img[i, int(np.clip(round(y), 1, H - 2)),
                       int(np.clip(round(x), 1, W - 2)), 0]
            assert px == src_color, (i, j, px, src_color)


def test_overflow_drops_are_counted():
    images, boxes, classes, kpts, mask = _batch(n_valid=(2, 2, 2, 2), m=2)
    o = mosaic_augment(images, boxes, classes, kpts, mask,
                       jax.random.PRNGKey(5), prob=1.0)
    o_mk, dropped = np.asarray(o[4]), float(o[5])
    # 4 sources x 2 valid = 8 candidates into 2 slots -> 6 dropped/img
    assert (o_mk.sum(1) == 2).all()
    assert dropped == 4 * 6


def test_deterministic_under_same_key():
    args = _batch()
    a = mosaic_augment(*args, jax.random.PRNGKey(7), prob=1.0)
    b = mosaic_augment(*args, jax.random.PRNGKey(7), prob=1.0)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _normalized(images, boxes, classes, kpts, mask):
    """Pixel-xyxy fixture -> the YoloPoseDataset batch convention
    (normalized cxcywh boxes, normalized keypoint x/y)."""
    x1, y1, x2, y2 = np.moveaxis(np.asarray(boxes), -1, 0)
    nboxes = np.stack([(x1 + x2) / (2 * W), (y1 + y2) / (2 * H),
                       (x2 - x1) / W, (y2 - y1) / H], -1).astype(np.float32)
    nkpts = np.asarray(kpts) / np.array([W, H, 1.0], np.float32)
    return (images, jnp.asarray(nboxes), classes, jnp.asarray(nkpts), mask)


def test_normalized_wrapper_keeps_labels_in_lockstep():
    """The YOLO train path feeds NORMALIZED cxcywh + normalized keypoints
    (data/yolo_pose.py); mosaic_augment_normalized must land every
    transformed keypoint on its own source's pixels — the convention
    mismatch that corrupted labels in round 2 (ADVICE #1)."""
    from tpupose.ops.mosaic import mosaic_augment_normalized

    images, boxes, _, kpts, mask = _batch()
    tag = jnp.broadcast_to(jnp.arange(4, dtype=jnp.float32)[:, None], (4, M))
    images, nboxes, tag, nkpts, mask = _normalized(images, boxes, tag,
                                                   kpts, mask)
    o = mosaic_augment_normalized(images, nboxes, tag, nkpts, mask,
                                  jax.random.PRNGKey(11), prob=1.0)
    o_img, o_box, o_tag, o_kp, o_mk, _ = map(np.asarray, o)
    for i in range(4):
        for j in range(M):
            if o_mk[i, j] < 0.5:
                continue
            # labels stay normalized: inside [0,1] (mosaic only shrinks)
            assert (o_box[i, j] >= -0.02).all() and (o_box[i, j] <= 1.02).all()
            src_color = (int(o_tag[i, j]) + 1) * 60
            x, y = o_kp[i, j, 0, :2] * (W, H)
            px = o_img[i, int(np.clip(round(y), 1, H - 2)),
                       int(np.clip(round(x), 1, W - 2)), 0]
            assert px == src_color, (i, j, px, src_color)
            # box w/h shrank by the quadrant scale (always < 1)
            assert o_box[i, j, 2] < 20 / W + 1e-6
            assert o_box[i, j, 3] < 20 / H + 1e-6


@pytest.mark.slow
def test_yolo_step_applies_mosaic():
    """The step-level wiring, fed the REAL YoloPoseDataset convention
    (normalized cxcywh + normalized kpts): mosaic_prob>0 reports the
    dropped metric and trains without shape errors."""
    import optax

    from tpupose.engine.train_state import (create_train_state,
                                            make_yolo_train_step)
    from tpupose.losses.pose_loss import ComputeLoss
    from tpupose.models.dinov3_pose import DINOv3Pose

    model = DINOv3Pose(backbone="dinov3_convnext_atto", num_keypoints=K,
                       num_classes=1, neck_channels=(16, 24, 32),
                       dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, H, W, 3), jnp.float32),
                               optax.adam(1e-3))
    loss = ComputeLoss(num_keypoints=K, num_classes=1)
    step = make_yolo_train_step(lambda p, t: loss(p, t),
                                mosaic_prob=0.5, mosaic_seed=0)
    images, boxes, classes, kpts, mask = _normalized(*_batch())
    batch = {"images": images, "boxes": boxes, "classes": classes,
             "keypoints": kpts, "instance_mask": mask}
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert "mosaic_dropped" in metrics
