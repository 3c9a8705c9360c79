import jax
import jax.numpy as jnp
import numpy as np

from tpupose.losses.assigner import TaskAlignedAssigner
from tpupose.losses.v8 import dfl_loss, v8DetectionLoss, v8PoseLoss


def _simple_case():
    """1 image, 1 GT box covering the left half of a 4x4 grid (stride 1)."""
    A = 16
    anc = np.stack(np.meshgrid(np.arange(4) + 0.5, np.arange(4) + 0.5,
                               indexing="xy"), -1).reshape(-1, 2).astype(np.float32)
    gt_boxes = np.array([[[0.0, 0.0, 2.0, 4.0]]], np.float32)  # xyxy
    gt_labels = np.zeros((1, 1), np.int32)
    mask_gt = np.ones((1, 1), np.float32)
    # predicted boxes: every anchor predicts a unit box centered on itself
    pd = np.concatenate([anc - 0.5, anc + 0.5], -1)[None].astype(np.float32)
    scores = np.full((1, A, 1), 0.5, np.float32)
    return scores, pd, anc, gt_labels, gt_boxes, mask_gt


def test_tal_assigns_only_inside_gt():
    scores, pd, anc, gl, gb, mg = _simple_case()
    tal = TaskAlignedAssigner(topk=10, num_classes=1)
    labels, boxes, ts, fg, tgi = jax.jit(tal)(
        jnp.asarray(scores), jnp.asarray(pd), jnp.asarray(anc),
        jnp.asarray(gl), jnp.asarray(gb), jnp.asarray(mg))
    fg = np.asarray(fg).reshape(4, 4)
    # anchors with x = 0.5 or 1.5 are inside the GT (left two columns)
    assert fg[:, :2].all()
    assert not fg[:, 2:].any()
    # assigned targets carry the GT box
    np.testing.assert_allclose(np.asarray(boxes)[0, 0], [0, 0, 2, 4])


def test_tal_conflict_resolution_prefers_higher_iou():
    A = 4
    anc = np.array([[0.5, 0.5], [1.5, 0.5], [0.5, 1.5], [1.5, 1.5]], np.float32)
    # two overlapping GTs, both containing all anchors
    gb = np.array([[[0, 0, 2, 2], [0, 0, 2.5, 2.5]]], np.float32)
    gl = np.array([[0, 0]], np.int32)
    mg = np.ones((1, 2), np.float32)
    # preds exactly equal to GT 0 -> IoU with GT0 = 1
    pd = np.tile(np.array([0, 0, 2, 2], np.float32), (1, A, 1))
    sc = np.full((1, A, 1), 0.9, np.float32)
    tal = TaskAlignedAssigner(topk=4, num_classes=1)
    labels, boxes, ts, fg, tgi = tal(
        jnp.asarray(sc), jnp.asarray(pd), jnp.asarray(anc),
        jnp.asarray(gl), jnp.asarray(gb), jnp.asarray(mg))
    assert np.asarray(fg).all()
    # all anchors should resolve to GT 0 (higher IoU)
    assert (np.asarray(tgi) == 0).all()


def test_tal_respects_gt_mask():
    scores, pd, anc, gl, gb, mg = _simple_case()
    mg = np.zeros_like(mg)  # no real GTs
    tal = TaskAlignedAssigner(topk=10, num_classes=1)
    _, _, ts, fg, _ = tal(jnp.asarray(scores), jnp.asarray(pd), jnp.asarray(anc),
                          jnp.asarray(gl), jnp.asarray(gb), jnp.asarray(mg))
    assert not np.asarray(fg).any()
    assert float(jnp.sum(ts)) == 0.0


def test_dfl_loss_zero_at_integer_target():
    # logits massively favoring bin 3, target exactly 3.0 -> ~0 loss
    logits = np.full((1, 4, 16), -20.0, np.float32)
    logits[..., 3] = 20.0
    t = np.full((1, 4), 3.0, np.float32)
    l = float(dfl_loss(jnp.asarray(logits), jnp.asarray(t)).mean())
    assert l < 1e-3
    # target 3.5 -> loss > 0
    l2 = float(dfl_loss(jnp.asarray(logits), jnp.asarray(t + 0.5)).mean())
    assert l2 > l


def _pose_targets(B=2, M=3, K=4):
    rng = np.random.RandomState(0)
    boxes = rng.uniform(0.3, 0.6, (B, M, 4)).astype(np.float32)
    boxes[..., 2:] = 0.25
    kpts = rng.uniform(0.3, 0.6, (B, M, K, 3)).astype(np.float32)
    kpts[..., 2] = 2.0
    return {
        "boxes": jnp.asarray(boxes),
        "classes": jnp.asarray(rng.randint(0, 2, (B, M)).astype(np.int32)),
        "keypoints": jnp.asarray(kpts),
        "instance_mask": jnp.asarray(np.array([[1, 1, 0]] * B, bool)),
    }


def test_v8_detection_loss_finite_and_jits():
    nc, rm = 2, 16
    loss = v8DetectionLoss(num_classes=nc, reg_max=rm, strides=(8, 16))
    preds = [jnp.zeros((2, 8, 8, 4 * rm + nc)), jnp.zeros((2, 4, 4, 4 * rm + nc))]
    total, parts = jax.jit(loss)(preds, _pose_targets())
    assert np.isfinite(float(total))
    assert set(parts) == {"box", "cls", "dfl"}


def test_v8_pose_loss_finite_and_grads_flow():
    nc, rm, K = 2, 8, 4
    loss = v8PoseLoss(num_keypoints=K, num_classes=nc, reg_max=rm, strides=(8,))
    C = 4 * rm + nc + 3 * K
    rng = np.random.RandomState(1)
    preds = [jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, C)).astype(np.float32))]
    targets = _pose_targets(K=K)

    def f(p):
        t, _ = loss([p], targets)
        return t

    g = jax.grad(f)(preds[0])
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
