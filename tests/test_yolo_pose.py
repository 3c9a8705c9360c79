"""YOLO-pose stack: head decode semantics, ComputeLoss assignment, and the
full DINOv3Pose forward (tiny)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpupose.losses.pose_loss import ComputeLoss
from tpupose.models.yolo_head import PoseHead, make_anchors, dist2bbox


def test_make_anchors_values():
    a, s = make_anchors([(2, 2), (1, 1)], [8, 16])
    a, s = np.asarray(a), np.asarray(s)
    assert a.shape == (5, 2)
    np.testing.assert_allclose(a[0], [0.5, 0.5])
    np.testing.assert_allclose(a[3], [1.5, 1.5])
    np.testing.assert_allclose(s, [8, 8, 8, 8, 16])


def test_dist2bbox_roundtrip():
    anchors = jnp.array([[4.0, 4.0]])
    dist = jnp.array([[1.0, 2.0, 3.0, 2.0]])  # l t r b
    xywh = np.asarray(dist2bbox(dist, anchors))
    np.testing.assert_allclose(xywh[0], [5.0, 4.0, 4.0, 4.0])


@pytest.mark.slow
def test_pose_head_train_and_eval_shapes():
    K, ncls = 4, 7
    head = PoseHead(num_classes=ncls, kpt_shape=(K, 3), dtype=jnp.float32)
    feats = [jnp.zeros((2, 8, 8, 64)), jnp.zeros((2, 4, 4, 128)),
             jnp.zeros((2, 2, 2, 256))]
    v = head.init(jax.random.PRNGKey(0), feats, train=True)
    outs, _ = head.apply(v, feats, train=True, mutable=["batch_stats"])
    assert [o.shape for o in outs] == [(2, 8, 8, ncls + 3 * K),
                                       (2, 4, 4, ncls + 3 * K),
                                       (2, 2, 2, ncls + 3 * K)]
    dec = head.apply(v, feats, train=False)
    A = 64 + 16 + 4
    assert dec.shape == (2, A, ncls + 3 * K)
    # cls scores are probabilities
    assert float(jnp.min(dec[..., :ncls])) >= 0.0
    assert float(jnp.max(dec[..., :ncls])) <= 1.0


def test_pose_head_decode_formula():
    """kpt_xy = (raw - 0.5 + anchor) * stride (reference head.py:205-211):
    raw == 0.5 at cell (0,0) of an 8-stride map -> pixel (4, 4)."""
    K, ncls = 1, 1
    head = PoseHead(num_classes=ncls, kpt_shape=(K, 3), strides=(8,),
                    dtype=jnp.float32)
    # one 2x2 scale; craft the raw map by bypassing convs: use decode directly
    raw = jnp.zeros((1, 2, 2, ncls + 3 * K))
    raw = raw.at[0, 0, 0, ncls + 0].set(0.5)  # kpt x raw
    raw = raw.at[0, 0, 0, ncls + 1].set(0.5)  # kpt y raw
    dec = head.decode([raw])
    xy = np.asarray(dec[0, 0, ncls:ncls + 2])
    np.testing.assert_allclose(xy, [4.0, 4.0], atol=1e-5)
    # cell (0, 1): raw 0, anchor x = 1.5 -> (0 - 0.5 + 1.5) * 8 = 8
    xy2 = np.asarray(dec[0, 1, ncls:ncls + 2])
    np.testing.assert_allclose(xy2[0], 8.0, atol=1e-5)


def _fake_targets(B=2, M=4, K=4):
    rng = np.random.RandomState(0)
    boxes = rng.uniform(0.3, 0.7, (B, M, 4)).astype(np.float32)
    boxes[..., 2:] = 0.2
    kpts = rng.uniform(0.3, 0.7, (B, M, K, 3)).astype(np.float32)
    kpts[..., 2] = 2.0
    cls = rng.randint(0, 3, (B, M)).astype(np.int32)
    mask = np.zeros((B, M), bool)
    mask[:, :2] = True  # 2 real instances each
    return {"boxes": jnp.asarray(boxes), "classes": jnp.asarray(cls),
            "keypoints": jnp.asarray(kpts), "instance_mask": jnp.asarray(mask)}


def test_compute_loss_finite_and_jittable():
    K, ncls = 4, 3
    loss = ComputeLoss(num_keypoints=K, num_classes=ncls, strides=(8, 16))
    preds = [jnp.zeros((2, 8, 8, ncls + 3 * K)), jnp.zeros((2, 4, 4, ncls + 3 * K))]
    targets = _fake_targets(K=K)
    total, parts = jax.jit(loss)(preds, targets)
    assert np.isfinite(float(total))
    for v in parts.values():
        assert np.isfinite(float(v))


def test_compute_loss_ignores_padded_instances():
    K, ncls = 4, 3
    loss = ComputeLoss(num_keypoints=K, num_classes=ncls, strides=(8,))
    preds = [jnp.asarray(np.random.RandomState(0).uniform(-1, 1,
             (2, 8, 8, ncls + 3 * K)).astype(np.float32))]
    t1 = _fake_targets(K=K)
    # corrupt the padded rows wildly; loss must not change
    t2 = {k: np.array(v) for k, v in t1.items()}
    t2["boxes"][:, 2:] = 0.9
    t2["keypoints"][:, 2:] = 0.1
    t2 = {k: jnp.asarray(v) for k, v in t2.items()}
    a, _ = loss(preds, t1)
    b, _ = loss(preds, t2)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_compute_loss_perfect_prediction_lowers_kpt_loss():
    """A prediction whose kpts sit exactly on the GT offsets should have a
    lower kpt loss than a wrong one."""
    K, ncls = 4, 1
    H = W = 8
    loss = ComputeLoss(num_keypoints=K, num_classes=ncls, strides=(8,),
                       kpt_loss_type="oks")
    targets = _fake_targets(B=1, M=2, K=K)
    boxes = np.asarray(targets["boxes"])
    kpts = np.asarray(targets["keypoints"])
    mask = np.asarray(targets["instance_mask"])
    pred = np.zeros((1, H, W, ncls + 3 * K), np.float32)
    for m in range(2):
        if not mask[0, m]:
            continue
        gx = int(np.clip(boxes[0, m, 0] * W, 0, W - 1))
        gy = int(np.clip(boxes[0, m, 1] * H, 0, H - 1))
        for k in range(K):
            pred[0, gy, gx, ncls + 3 * k + 0] = kpts[0, m, k, 0] * W - gx
            pred[0, gy, gx, ncls + 3 * k + 1] = kpts[0, m, k, 1] * H - gy
            pred[0, gy, gx, ncls + 3 * k + 2] = 5.0  # confident visible
    _, parts_good = loss([jnp.asarray(pred)], targets)
    _, parts_bad = loss([jnp.zeros_like(jnp.asarray(pred))], targets)
    assert float(parts_good["kpt"]) < float(parts_bad["kpt"])
    assert float(parts_good["kpt"]) < 1e-4


@pytest.mark.slow
def test_dinov3_pose_forward_tiny():
    from tpupose.models.dinov3_pose import DINOv3Pose

    m = DINOv3Pose(backbone="dinov3_convnext_atto", num_keypoints=4,
                   num_classes=7, neck_channels=(48, 96, 192),
                   dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=True)
    outs, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert len(outs) == 3
    assert outs[0].shape == (1, 8, 8, 7 + 12)
    dec = m.apply(v, x, train=False)
    assert dec.shape == (1, 64 + 16 + 4, 7 + 12)


def test_compute_loss_sample_mask_excludes_padded_rows():
    """Per-image sample_mask zeroes a padded duplicate row's cls
    contribution (Trainer.validate's pad_last contract): same loss with
    and without the padded row riding along."""
    K, ncls = 4, 3
    loss = ComputeLoss(num_keypoints=K, num_classes=ncls, strides=(8,))
    rng = np.random.RandomState(1)
    p1 = rng.uniform(-1, 1, (1, 8, 8, ncls + 3 * K)).astype(np.float32)
    t1 = _fake_targets(B=1, K=K)
    t1 = {k: jnp.asarray(np.asarray(v)[:1]) for k, v in t1.items()}
    a, _ = loss([jnp.asarray(p1)], t1)

    p2 = np.concatenate([p1, p1])                 # duplicate row
    t2 = {k: jnp.asarray(np.concatenate([np.asarray(v)] * 2))
          for k, v in t1.items()}
    mask = np.asarray(t2["instance_mask"]).copy()
    mask[1] = False                               # padded row: no instances
    t2["instance_mask"] = jnp.asarray(mask)
    t2["sample_mask"] = jnp.asarray([1.0, 0.0], jnp.float32)
    b, _ = loss([jnp.asarray(p2)], t2)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


@pytest.mark.slow
def test_v8_loss_sample_mask_excludes_padded_rows():
    from tpupose.losses.v8 import v8PoseLoss

    K, ncls, rm = 4, 1, 4
    loss = v8PoseLoss(num_keypoints=K, num_classes=ncls, strides=(8,),
                      reg_max=rm)
    C = 4 * rm + ncls + 3 * K
    rng = np.random.RandomState(2)
    p1 = rng.uniform(-1, 1, (1, 8, 8, C)).astype(np.float32)
    t1 = _fake_targets(B=1, K=K)
    t1 = {k: jnp.asarray(np.asarray(v)[:1]) for k, v in t1.items()}
    t1["classes"] = jnp.zeros_like(t1["classes"])
    a, _ = loss([jnp.asarray(p1)], t1)

    p2 = np.concatenate([p1, p1])
    t2 = {k: jnp.asarray(np.concatenate([np.asarray(v)] * 2))
          for k, v in t1.items()}
    mask = np.asarray(t2["instance_mask"]).copy()
    mask[1] = False
    t2["instance_mask"] = jnp.asarray(mask)
    t2["sample_mask"] = jnp.asarray([1.0, 0.0], jnp.float32)
    b, _ = loss([jnp.asarray(p2)], t2)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-5)
