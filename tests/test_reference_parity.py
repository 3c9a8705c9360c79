"""Numerical parity against the ACTUAL reference implementation
(VERDICT r1 item #2): the torch modules under /root/reference/HPE are
imported read-only and fed the same random inputs as their tpupose twins.

Covered pairs (reference file:line -> tpupose):
  - KeypointLoss (OKS)        loss.py:29-39        -> losses.keypoint.oks_loss
  - ComputeLoss.bbox_iou      loss.py:317-347      -> losses.bbox.ciou
  - ComputeLoss.point2box     loss.py:277-315      -> losses.bbox.kpts_to_box
  - VarifocalLoss             loss.py:9-27         -> losses.classify.varifocal_loss
  - ComputeLoss (full)        loss.py:228-448      -> losses.pose_loss.ComputeLoss
  - make_anchors              models/utils.py:15-27 -> models.yolo_head.make_anchors
  - PoseHead._inference_pose  models/nn/modules/head.py:185-211 -> PoseHead.decode
  - PCK                       core/metric/pck.py:5-104 -> metrics.pck.PCK
  - OKS / OKSAP               core/metric/oksap.py -> metrics.oks_ap
  - TaskAlignedAssigner       core/assigner.py:5-305 -> losses.assigner

Documented intentional deviation: the reference divides its (already
instance-averaged) keypoint loss by num_pos a second time; tpupose
normalizes exactly once, so ours == ref * num_pos for that term
(asserted explicitly in test_compute_loss_parity).
"""

import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/HPE"


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules read-only. torchvision isn't installed
    in this env; head.py only uses it at postprocess runtime, so a bare
    stub module satisfies the import."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.ops = types.SimpleNamespace(nms=None)
        sys.modules["torchvision"] = tv
    if "timm" not in sys.modules:
        # models/__init__.py pulls DeepPose -> timm; only create_model is
        # referenced at class-construction time, never during these tests
        tm = types.ModuleType("timm")
        tm.create_model = None
        sys.modules["timm"] = tm
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    ns = types.SimpleNamespace()
    ns.loss = importlib.import_module("loss")
    ns.pck = importlib.import_module("core.metric.pck")
    ns.oksap = importlib.import_module("core.metric.oksap")
    ns.assigner = importlib.import_module("core.assigner")
    ns.head = importlib.import_module("models.nn.modules.head")
    ns.mutils = importlib.import_module("models.utils")
    return ns


SIGMAS17 = np.array([.26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62,
                     1.07, 1.07, .87, .87, .89, .89], np.float32) / 10.0


def test_oks_keypoint_loss_parity(ref):
    rng = np.random.RandomState(0)
    N, K = 6, 17
    pred = rng.uniform(0, 8, (N, K, 2)).astype(np.float32)
    gt = pred + rng.randn(N, K, 2).astype(np.float32)
    mask = (rng.rand(N, K) > 0.25).astype(np.float32)
    mask[:, 0] = 1.0  # at least one visible per instance
    area = rng.uniform(4, 40, N).astype(np.float32)

    t = ref.loss.KeypointLoss(torch.from_numpy(SIGMAS17))(
        torch.from_numpy(pred), torch.from_numpy(gt),
        torch.from_numpy(mask), torch.from_numpy(area))

    from tpupose.losses.keypoint import oks_loss

    ours = np.asarray(oks_loss(jnp.asarray(pred), jnp.asarray(gt),
                               jnp.asarray(mask), jnp.asarray(area)))
    # reference returns the mean over instances of the per-instance loss
    np.testing.assert_allclose(ours.mean(), float(t), rtol=1e-5)


def test_ciou_parity(ref):
    rng = np.random.RandomState(1)
    N = 32
    b1 = np.stack([rng.uniform(2, 10, N), rng.uniform(2, 10, N),
                   rng.uniform(1, 6, N), rng.uniform(1, 6, N)], -1).astype(np.float32)
    b2 = np.stack([rng.uniform(2, 10, N), rng.uniform(2, 10, N),
                   rng.uniform(1, 6, N), rng.uniform(1, 6, N)], -1).astype(np.float32)
    t = ref.loss.ComputeLoss.bbox_iou(torch.from_numpy(b1),
                                      torch.from_numpy(b2), CIoU=True)
    from tpupose.losses.bbox import ciou

    ours = np.asarray(ciou(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(ours, t.numpy(), atol=2e-5)


def test_kpts_to_box_parity(ref):
    rng = np.random.RandomState(2)
    N, K = 8, 17
    pts = rng.uniform(0, 20, (N, K, 2)).astype(np.float32)
    vis = (rng.rand(N, K) > 0.3).astype(np.float32)
    # cover the branch boundaries: exactly 2, 4, 5 visible + all visible
    vis[0] = 0.0; vis[0, :2] = 1.0
    vis[1] = 0.0; vis[1, :4] = 1.0
    vis[2] = 0.0; vis[2, :5] = 1.0
    vis[3] = 1.0
    t = ref.loss.ComputeLoss.point2box_xywh(
        None, torch.from_numpy(pts), torch.from_numpy(vis))
    from tpupose.losses.bbox import kpts_to_box

    ours = np.asarray(kpts_to_box(jnp.asarray(pts), jnp.asarray(vis)))
    np.testing.assert_allclose(ours, t.numpy(), atol=1e-5)


def test_varifocal_parity(ref):
    rng = np.random.RandomState(3)
    logits = rng.randn(64, 3).astype(np.float32) * 2
    gt_score = rng.rand(64, 3).astype(np.float32)
    label = (rng.rand(64, 3) > 0.8).astype(np.float32)
    gt_score = gt_score * label  # scores only on positives, like the loss

    t = ref.loss.VarifocalLoss(gamma=2.0, alpha=0.75)(
        torch.from_numpy(logits), torch.from_numpy(gt_score),
        torch.from_numpy(label))

    from tpupose.losses.classify import varifocal_loss

    ours = np.asarray(varifocal_loss(jnp.asarray(logits),
                                     jnp.asarray(gt_score),
                                     jnp.asarray(label))).sum()
    np.testing.assert_allclose(ours, float(t), rtol=1e-5)


def test_make_anchors_parity(ref):
    shapes = [(8, 6), (4, 3), (2, 2)]
    strides = (8, 16, 32)
    feats = [torch.zeros(1, 4, h, w) for h, w in shapes]
    t_pts, t_str = ref.mutils.make_anchors(feats, torch.tensor(strides), 0.5)

    from tpupose.models.yolo_head import make_anchors

    pts, sts = make_anchors(shapes, strides)
    np.testing.assert_allclose(np.asarray(pts), t_pts.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sts), t_str.numpy().reshape(-1), atol=1e-6)


def test_pose_head_decode_parity(ref):
    """Identical raw multi-scale maps through both decode paths."""
    rng = np.random.RandomState(4)
    nc, K = 2, 5
    C = nc + K * 3
    shapes = [(8, 8), (4, 4), (2, 2)]
    maps_nchw = [rng.randn(2, C, h, w).astype(np.float32) for h, w in shapes]

    rhead = ref.head.PoseHead(ncls=nc, kpt_shape=(K, 3), in_ch=(8, 16, 32))
    rhead.eval()
    with torch.no_grad():
        t = rhead._inference_pose([torch.from_numpy(m.copy()) for m in maps_nchw])

    from tpupose.models.yolo_head import PoseHead

    ours_head = PoseHead(num_classes=nc, kpt_shape=(K, 3), strides=(8, 16, 32))
    outs_nhwc = [jnp.asarray(m.transpose(0, 2, 3, 1)) for m in maps_nchw]
    ours = np.asarray(ours_head.decode(outs_nhwc))        # (B, A, C)
    np.testing.assert_allclose(ours.transpose(0, 2, 1), t.numpy(), atol=1e-5)


def test_pck_parity(ref):
    rng = np.random.RandomState(5)
    N, K = 10, 17
    gt = rng.uniform(0, 100, (N, K, 2)).astype(np.float32)
    pred = gt + rng.randn(N, K, 2).astype(np.float32) * 8
    vis = (rng.rand(N, K) > 0.2).astype(np.float32)

    t = ref.pck.PCK(alpha=0.2).compute(torch.from_numpy(gt),
                                       torch.from_numpy(pred),
                                       torch.from_numpy(vis))

    from tpupose.metrics.pck import PCK

    m = PCK(alpha=0.2)
    m.update(pred, gt, vis)
    ours = m.compute()["pck"]
    np.testing.assert_allclose(ours * 100.0, t, rtol=1e-6)


def test_oks_formula_parity(ref):
    rng = np.random.RandomState(6)
    N, K = 7, 17
    gt_xy = rng.uniform(0, 80, (N, K, 2)).astype(np.float32)
    pred = gt_xy + rng.randn(N, K, 2).astype(np.float32) * 5
    v = (rng.rand(N, K) > 0.2).astype(np.float32) * 2
    area = rng.uniform(500, 4000, N).astype(np.float32)
    gt3 = np.concatenate([gt_xy, v[..., None]], -1)

    t = ref.oksap.OKS(torch.from_numpy(SIGMAS17)).compute(
        torch.from_numpy(gt3), torch.from_numpy(pred), torch.from_numpy(area))

    from tpupose.metrics.oks_ap import compute_oks

    # ours is an (N, M) matrix; the paired diagonal must match the reference
    ours = np.asarray(compute_oks(jnp.asarray(pred), jnp.asarray(gt_xy),
                                  jnp.asarray(v), jnp.asarray(area)))
    np.testing.assert_allclose(np.diag(ours), t.numpy(), rtol=1e-4)


def test_oksap_pipeline_agreement(ref):
    """The reference's OKSAP pairs pred[i]<->gt[i] and integrates the
    envelope by trapezoid; ours does greedy matching + 101-pt COCO
    interpolation. On paired data with score-correlated quality the two
    must agree closely (exact equality is not expected — different AP
    integration rule)."""
    rng = np.random.RandomState(7)
    K = 17
    r = ref.oksap.OKSAP(num_classes=1, sigmas=torch.from_numpy(SIGMAS17))

    from tpupose.metrics.oks_ap import OKSAP

    m = OKSAP(num_classes=1)
    for _ in range(6):
        N = 8
        gt = rng.uniform(0, 100, (N, K, 2)).astype(np.float32)
        noise = rng.uniform(0, 14, (N, 1, 1)).astype(np.float32)
        pred = gt + rng.randn(N, K, 2).astype(np.float32) * noise
        v = np.full((N, K), 2.0, np.float32)
        area = np.full(N, 3000.0, np.float32)
        scores = (1.0 / (1.0 + noise[:, 0, 0])).astype(np.float32)
        gt3 = np.concatenate([gt, v[..., None]], -1)
        r.update(torch.from_numpy(gt3), torch.from_numpy(pred),
                 torch.from_numpy(area), torch.from_numpy(scores),
                 torch.zeros(N, dtype=torch.long))
        # ours: one matched pair per "image"
        for i in range(N):
            m.update(pred[i:i + 1], scores[i:i + 1], gt[i:i + 1],
                     v[i:i + 1], area[i:i + 1])
    rt = r.compute()
    ours = m.compute()
    assert abs(ours["mAP"] - rt["mAP"]) < 0.03, (ours, rt)
    assert abs(ours["mAP50"] - rt["mAP_50"]) < 0.03
    assert abs(ours["mAP75"] - rt["mAP_75"]) < 0.05


def test_task_aligned_assigner_parity(ref):
    """Documented deviations (ours follows ultralytics semantics, the
    reference's intent per SURVEY.md §2.11 "implement the intent"):
      1. the reference re-sigmoids pd_scores inside get_box_metrics even
         though its callers already pass probabilities (double sigmoid) —
         so we feed the reference raw logits and ours sigmoid(logits);
      2. the reference top-ks the metric over ALL anchors and only then
         intersects with the in-box mask; ours (like ultralytics) masks
         the metric by in-box membership before top-k. The test uses tight
         anchor-centered predicted boxes + well-separated GTs so both
         selections coincide and the comparison is exact.
    """
    rng = np.random.RandomState(8)
    B, A, M, C = 2, 84, 2, 4
    logits = rng.randn(B, A, C).astype(np.float32)
    pd_scores = 1.0 / (1.0 + np.exp(-logits))
    anc = np.stack(np.meshgrid(np.arange(12) + 0.5, np.arange(7) + 0.5),
                   -1).reshape(-1, 2).astype(np.float32) * 10
    # tight boxes centered on their anchor: IoU with a GT is high only for
    # anchors inside/near that GT
    half = rng.uniform(4, 7, (B, A, 2)).astype(np.float32)
    pd_boxes = np.concatenate([anc - half, anc + half], -1).astype(np.float32)
    # two well-separated GTs per image
    gt_boxes = np.array([[[12, 8, 52, 44], [72, 28, 112, 62]],
                         [[18, 22, 55, 58], [70, 5, 108, 40]]], np.float32)
    gt_labels = rng.randint(0, C, (B, M)).astype(np.int64)
    mask_gt = np.ones((B, M), np.float32)
    mask_gt[1, 1] = 0.0  # one padded GT

    with torch.no_grad():
        t_bb, t_sc, t_fg, t_idx = ref.assigner.TaskAlignedAssigner(
            topk=4, num_classes=C)(
            torch.from_numpy(logits), torch.from_numpy(pd_boxes),
            torch.from_numpy(anc), torch.from_numpy(gt_labels[..., None]),
            torch.from_numpy(gt_boxes), torch.from_numpy(mask_gt[..., None]))

    from tpupose.losses.assigner import TaskAlignedAssigner

    tl, bb, sc, fg, idx = TaskAlignedAssigner(topk=4, num_classes=C)(
        jnp.asarray(pd_scores), jnp.asarray(pd_boxes), jnp.asarray(anc),
        jnp.asarray(gt_labels), jnp.asarray(gt_boxes), jnp.asarray(mask_gt))

    fg = np.asarray(fg).astype(bool)
    np.testing.assert_array_equal(fg, t_fg.numpy())
    np.testing.assert_array_equal(np.asarray(idx)[fg], t_idx.numpy()[fg])
    np.testing.assert_allclose(np.asarray(bb)[fg], t_bb.numpy()[fg], atol=1e-4)
    # target_scores: the reference scatters norm_align_metric.long()
    # (assigner.py:100-102) — a float-in-[0,1] truncated to int, so every
    # score quantizes to 0 except the exact 1.0 at each GT's best anchor
    # (deviation #3, a reference bug). We assert the INTENDED ultralytics
    # normalization on ours: scores positive exactly on fg anchors and
    # bounded by 1 — and document the reference's quantization.
    sc = np.asarray(sc)
    assert ((sc.sum(-1) > 0) == fg).all()
    assert sc.max() <= 1.0 + 1e-6
    t_sc_np = t_sc.numpy()
    assert set(np.unique(t_sc_np)) <= {0.0, 1.0}  # the truncation bug
    assert t_sc_np.sum() <= mask_gt.sum()         # at most one 1 per GT


def _ref_compute_loss(ref, nc, K, use_oks=True):
    """Reference ComputeLoss with a stub model and its own OKS KeypointLoss
    (our config kpt_loss_type='oks')."""

    class Head:
        pass

    class Model(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.p = torch.nn.Parameter(torch.zeros(1))
            self.head = Head()
            self.head.nc = nc
            self.head.nk = K * 3

    rl = ref.loss.ComputeLoss(Model())
    if use_oks:
        rl.kpt_loss_fn = ref.loss.KeypointLoss(torch.from_numpy(SIGMAS17))
    return rl


@pytest.mark.slow
def test_compute_loss_parity(ref):
    """Full center-cell ComputeLoss on identical inputs. One GT per image
    (so num_pos is identical per scale) with the documented normalization
    deviation applied: ours_kpt == ref_kpt * num_instances."""
    rng = np.random.RandomState(9)
    B, nc, K = 3, 2, 17
    shapes = [(16, 16), (8, 8), (4, 4)]
    preds_nchw = [rng.randn(B, nc + K * 3, h, w).astype(np.float32) * 0.5
                  for h, w in shapes]

    # one GT per image, centers well separated
    rows = []
    boxes = np.zeros((B, 1, 4), np.float32)
    kpts = np.zeros((B, 1, K, 3), np.float32)
    cls_idx = np.zeros((B, 1), np.int64)
    for b in range(B):
        cx, cy = rng.uniform(0.2, 0.8, 2)
        w, h = rng.uniform(0.2, 0.4, 2)
        c = rng.randint(nc)
        kp = []
        for k in range(K):
            kx = np.clip(cx + rng.uniform(-w / 2, w / 2), 0.01, 0.99)
            ky = np.clip(cy + rng.uniform(-h / 2, h / 2), 0.01, 0.99)
            vv = 2.0 if rng.rand() > 0.2 else 0.0
            kp += [kx, ky, vv]
            kpts[b, 0, k] = (kx, ky, vv)
        rows.append([b, c, cx, cy, w, h] + kp)
        boxes[b, 0] = (cx, cy, w, h)
        cls_idx[b, 0] = c
    targets_ref = torch.tensor(rows, dtype=torch.float32)

    rl = _ref_compute_loss(ref, nc, K)
    with torch.no_grad():
        _, (r_cls, r_kpt, r_vis) = rl(
            [torch.from_numpy(p.copy()) for p in preds_nchw], targets_ref)

    from tpupose.losses.pose_loss import ComputeLoss

    ours_fn = ComputeLoss(num_keypoints=K, num_classes=nc,
                          strides=(8, 16, 32), kpt_loss_type="oks",
                          cls_weight=1.0, kpt_weight=10.0, vis_weight=5.0)
    targets = {"boxes": jnp.asarray(boxes), "classes": jnp.asarray(cls_idx),
               "keypoints": jnp.asarray(kpts),
               "instance_mask": jnp.ones((B, 1), bool)}
    preds_nhwc = [jnp.asarray(p.transpose(0, 2, 3, 1)) for p in preds_nchw]
    _, parts = ours_fn(preds_nhwc, targets)

    np.testing.assert_allclose(float(parts["cls"]), r_cls, rtol=2e-4)
    np.testing.assert_allclose(float(parts["vis"]), r_vis, rtol=2e-4)
    # documented deviation: single num_pos normalization => factor B
    np.testing.assert_allclose(float(parts["kpt"]), r_kpt * B, rtol=2e-4)
