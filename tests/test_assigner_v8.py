import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


@pytest.mark.slow
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


def test_pose_head_v8_variant_matches_loss_layout():
    """ADVICE r1: the v8_pose loss expects (4*reg_max + nc + K*3) channels
    and the (2v + anchor - 0.5)*stride kpt decode. The reg_max>0 PoseHead
    provides exactly that: a train step traces, and its eval decode equals
    the loss's internal decode on the same raw maps."""
    from tpupose.models.yolo_head import PoseHead, make_anchors

    nc, rm, K = 2, 4, 3
    head = PoseHead(num_classes=nc, kpt_shape=(K, 3), strides=(8, 16),
                    reg_max=rm, dtype=jnp.float32)
    feats = [jnp.zeros((2, 8, 8, 16)), jnp.zeros((2, 4, 4, 32))]
    v = head.init(jax.random.PRNGKey(0), feats, train=True)
    outs, _ = head.apply(v, feats, train=True, mutable=["batch_stats"])
    C = 4 * rm + nc + 3 * K
    assert outs[0].shape == (2, 8, 8, C) and outs[1].shape == (2, 4, 4, C)

    # loss consumes those maps directly
    loss = v8PoseLoss(num_keypoints=K, num_classes=nc, reg_max=rm,
                      strides=(8, 16))
    total, parts = jax.jit(loss)(list(outs), _pose_targets(K=K))
    assert np.isfinite(float(total))
    assert {"box", "cls", "dfl", "kpt", "vis"} == set(parts)

    # decode conventions agree: head eval decode vs the loss's kpt decode
    rng = np.random.RandomState(3)
    raw = [jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, C)).astype(np.float32)),
           jnp.asarray(rng.uniform(-1, 1, (2, 4, 4, C)).astype(np.float32))]
    dec = head.decode(raw)                       # (B, A, 4 + nc + K*3)
    assert dec.shape[-1] == 4 + nc + K * 3
    anchors, strides = make_anchors([(8, 8), (4, 4)], (8, 16))
    flat = jnp.concatenate([r.reshape(2, -1, C) for r in raw], 1)
    kraw = flat[..., 4 * rm + nc:].reshape(2, -1, K, 3)
    want_xy = (2.0 * kraw[..., :2] + (anchors[None, :, None, :] - 0.5)) \
        * strides[None, :, None, None]
    got = dec[..., 4 + nc:].reshape(2, -1, K, 3)
    np.testing.assert_allclose(np.asarray(got[..., :2]), np.asarray(want_xy),
                               atol=1e-5)


@pytest.mark.slow
def test_builder_v8_pose_head_loss_pairing(tmp_path):
    """Builder auto-selects reg_max=16 for loss v8_pose so the built model
    and loss are trace-compatible end to end."""
    from tpupose.configs.default import default_config
    from tpupose.engine.builder import Builder

    cfg = default_config()
    cfg.model.name = "dinov3_pose"
    cfg.model.backbone = "dinov3_convnext_atto"
    cfg.model.neck_channels = (32, 64, 128)
    cfg.model.num_keypoints = 4
    cfg.model.num_classes = 2
    cfg.loss.name = "v8_pose"
    cfg.train.mixed_precision = False
    b = Builder(cfg)
    model = b.model()
    loss = b.loss(model)
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=True)
    outs, _ = model.apply(v, x, train=True, mutable=["batch_stats"])
    assert outs[0].shape[-1] == 4 * 16 + 2 + 3 * 4
    targets = _pose_targets(K=4)
    targets = {k: v_[:1] for k, v_ in targets.items()}
    total, _ = loss(outs, targets)
    assert np.isfinite(float(total))
