"""Metric library: hand-computed values for PCK/PCKh/PDJ/PCP(m)/MPJPE/
DetectionMAP/ClassifyMet/mask_iou (the reference keeps these checks in
__main__ smoke blocks, SURVEY.md §4; here they are real tests)."""

import numpy as np

from tpupose.metrics import (
    CMet, ClassifyMet, DetectionMAP, MPJPE, PCK, PCKh, PCP, PCPm, PDJ,
    PMet, mask_iou,
)


def test_pck_hand_computed():
    # bbox max-side = 10; alpha 0.5 -> threshold 5
    gt = np.array([[[0.0, 0.0], [10.0, 0.0], [10.0, 10.0]]])
    pred = gt + np.array([[[3.0, 0.0], [0.0, 6.0], [0.0, 0.0]]])
    vis = np.ones((1, 3))
    m = PCK(alpha=0.5)
    m.update(pred, gt, vis)
    out = m.compute()
    assert out["pck"] == 2 / 3
    np.testing.assert_allclose(out["per_joint"], [1, 0, 1])


def test_pckh_uses_head_size():
    # head joints 0-1 distance 10 * 0.6 = 6; alpha 0.5 -> threshold 3
    gt = np.zeros((1, 3, 2))
    gt[0, 1] = [10, 0]
    gt[0, 2] = [5, 5]
    pred = gt.copy()
    pred[0, 2] += [2.9, 0]   # within 3
    pred[0, 0] += [4.0, 0]   # outside 3
    m = PCKh(alpha=0.5, head_indices=(0, 1))
    m.update(pred, gt, np.ones((1, 3)))
    assert m.compute()["pckh"] == 2 / 3


def test_pdj_uses_torso():
    gt = np.zeros((1, 4, 2))
    gt[0, 1] = [0, 20]  # torso = joints 0,1 -> 20; alpha .2 -> threshold 4
    pred = gt.copy()
    pred[0, 2] += [3.9, 0]
    pred[0, 3] += [4.1, 0]
    m = PDJ(alpha=0.2, torso_indices=(0, 1))
    m.update(pred, gt, np.ones((1, 4)))
    assert m.compute()["pdj"] == 3 / 4


def test_pcp_both_endpoints_rule():
    # limb (0,1) length 10, alpha .5 -> threshold 5
    gt = np.zeros((1, 2, 2))
    gt[0, 1] = [10, 0]
    ok_pred = gt + 3.0
    bad_pred = gt.copy()
    bad_pred[0, 1] += [0, 7]  # one endpoint off -> limb incorrect
    m = PCP(alpha=0.5, limbs=((0, 1),))
    m.update(ok_pred, gt, np.ones((1, 2)))
    m.update(bad_pred, gt, np.ones((1, 2)))
    out = m.compute()
    assert out["pcp"] == 0.5


def test_pcpm_uses_mean_limb_length():
    gt1 = np.zeros((1, 2, 2)); gt1[0, 1] = [2, 0]    # short limb
    gt2 = np.zeros((1, 2, 2)); gt2[0, 1] = [18, 0]   # long limb; mean = 10
    pred_off = lambda g: g + np.array([[[0, 4.0], [0, 4.0]]])
    m = PCPm(alpha=0.5, limbs=((0, 1),))   # threshold = 5 (mean-based)
    m.update(pred_off(gt1), gt1, np.ones((1, 2)))
    m.update(pred_off(gt2), gt2, np.ones((1, 2)))
    assert m.compute()["pcpm"] == 1.0      # both within mean-based 5
    # per-instance PCP would have failed the short limb (threshold 1)
    m2 = PCP(alpha=0.5, limbs=((0, 1),))
    m2.update(pred_off(gt1), gt1, np.ones((1, 2)))
    assert m2.compute()["pcp"] == 0.0


def test_mpjpe_visibility_mask():
    gt = np.zeros((1, 2, 2))
    pred = gt + np.array([[[3, 4], [30, 40]]])  # dists 5 and 50
    m = MPJPE()
    m.update(pred, gt, np.array([[1, 0]]))
    assert m.compute()["mpjpe"] == 5.0


def test_detection_map_perfect_and_missed():
    m = DetectionMAP(num_classes=1)
    gt = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    m.update(gt, np.array([0.9, 0.8]), np.zeros(2, int), gt, np.zeros(2, int))
    out = m.compute()
    assert out["mAP50"] == 1.0
    m2 = DetectionMAP(num_classes=1)
    m2.update(gt + 100, np.array([0.9, 0.8]), np.zeros(2, int), gt,
              np.zeros(2, int))
    assert m2.compute()["mAP"] == 0.0


def test_classify_metrics():
    m = ClassifyMet(num_classes=3, topk=2)
    logits = np.array([[5, 1, 0], [0, 5, 1], [1, 0, 5], [4, 5, 0]], np.float32)
    labels = np.array([0, 1, 2, 0])  # last one wrong (pred 1), but top-2 hit
    m.update(logits, labels)
    out = m.compute()
    assert out["accuracy"] == 3 / 4
    assert out["top2"] == 1.0
    assert out["recall"][0] == 0.5  # class 0: 1 of 2 correct


def test_mask_iou():
    a = np.zeros((1, 4, 4), bool); a[0, :2] = True        # 8 px
    b = np.zeros((2, 4, 4), bool); b[0, :2] = True; b[1, 1:3] = True
    iou = mask_iou(a, b)
    assert iou.shape == (1, 2)
    assert iou[0, 0] == 1.0
    np.testing.assert_allclose(iou[0, 1], 4 / 12)


def test_reference_aliases():
    from tpupose.metrics import OKSAP

    assert PMet is OKSAP and CMet is ClassifyMet


def test_auc_metric():
    """AUC of the PCK curve: hand-computed trapezoid for a constant
    normalized distance, and 1.0 for a perfect predictor."""
    from tpupose.metrics import AUC

    gt = np.array([[[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]]], np.float32)
    vis = np.ones((1, 3), np.float32)
    m = AUC(max_threshold=0.5, num_steps=20)
    m.update(gt, gt, vis)                      # perfect
    out = m.compute()
    assert out["auc"] == 1.0 and out["epe_norm"] == 0.0

    # every joint 0.11 * L away (L = bbox max side = 10; 0.11 sits
    # strictly between the 0.1 and 0.125 thresholds): pck = 0 through
    # t=0.1, 1 from t=0.125 -> trapezoid (0.5*0.025 + 0.375) / 0.5 = 0.775
    m.reset()
    pred = gt + np.array([1.1, 0.0], np.float32)
    m.update(pred, gt, vis)
    out = m.compute()
    np.testing.assert_allclose(out["auc"], 0.775, atol=1e-6)
    np.testing.assert_allclose(out["epe_norm"], 0.11, atol=1e-6)


def test_epe_metric():
    from tpupose.metrics import EPE

    gt = np.zeros((2, 2, 2), np.float32)
    pred = gt.copy()
    pred[0, 0] = [3.0, 4.0]                    # distance 5
    vis = np.ones((2, 2), np.float32)
    vis[1, 1] = 0.0                            # excluded joint
    m = EPE()
    m.update(pred, gt, vis)
    np.testing.assert_allclose(m.compute()["epe"], 5.0 / 3.0, atol=1e-6)


def _one_gt(K=17, at=(50.0, 50.0), spread=30.0):
    gk = np.zeros((1, K, 2), np.float32)
    gk[0, :, 0] = at[0] + np.linspace(0, spread, K)
    gk[0, :, 1] = at[1] + np.linspace(0, spread, K)
    gv = np.ones((1, K), np.float32)
    ga = np.asarray([40.0 * 40.0], np.float32)   # medium range
    return gk, gv, ga


def test_oksap_zero_visible_gt_is_ignore_region():
    """pycocotools semantics: a num_keypoints==0 annotation is an ignore
    region — out of the recall denominator, and a detection landing on it
    (bbox-proximity OKS) is dropped from the ranking, not an FP."""
    from tpupose.metrics.oks_ap import OKSAP

    K = 17
    gk, gv, ga = _one_gt(K)
    # second GT: no visible joints, bbox elsewhere
    gk2 = np.concatenate([gk, np.zeros((1, K, 2), np.float32)])
    gv2 = np.concatenate([gv, np.zeros((1, K), np.float32)])
    ga2 = np.concatenate([ga, [60.0 * 60.0]]).astype(np.float32)
    gb2 = np.asarray([[40, 40, 50, 50], [200, 200, 60, 60]], np.float32)

    # perfect pred of the labeled GT + a spurious det inside the ignore
    # bbox, OUTSCORING the real one
    pk = np.concatenate([gk, np.full((1, K, 2), 220.0, np.float32)])
    ps = np.asarray([0.9, 0.95], np.float32)
    ap = OKSAP(num_classes=1)
    ap.update(pk, ps, gk2, gv2, ga2, gt_bbox=gb2)
    out = ap.compute()
    assert out["mAP"] == 1.0, out
    # without the bbox info the ignore region cannot absorb the spurious
    # det, but the zero-visible GT still must not enter the denominator
    ap2 = OKSAP(num_classes=1)
    ap2.update(gk.copy(), np.asarray([0.9], np.float32), gk2, gv2, ga2)
    assert ap2.compute()["mAP"] == 1.0


def test_oksap_max_dets_cap():
    """COCO keypoints evaluates @ maxDets=20: detections past the top-20
    by score never enter the ranking."""
    from tpupose.metrics.oks_ap import OKSAP

    K = 17
    gk, gv, ga = _one_gt(K)
    # 21 dets: 20 misses outscoring 1 perfect prediction
    pk = np.concatenate([np.full((20, K, 2), 500.0, np.float32), gk])
    ps = np.concatenate([np.linspace(0.9, 0.5, 20),
                         [0.1]]).astype(np.float32)
    ap = OKSAP(num_classes=1, max_dets=20)
    ap.update(pk, ps, gk, gv, ga)
    assert ap.compute()["mAP"] == 0.0
    ap_all = OKSAP(num_classes=1, max_dets=100)
    ap_all.update(pk, ps, gk, gv, ga)
    assert ap_all.compute()["mAP"] > 0.0


def test_oksap_ignored_gt_matched_once():
    """A non-crowd ignored GT absorbs ONE detection; a second detection
    overlapping it counts as FP (pycocotools gtm marking)."""
    from tpupose.metrics.oks_ap import OKSAP

    K = 17
    gk, gv, ga = _one_gt(K)                      # medium GT (in M range)
    big = np.zeros((1, K, 2), np.float32)        # large GT -> ignored in M
    big[0, :, 0] = 300 + np.linspace(0, 150, K)
    big[0, :, 1] = 300 + np.linspace(0, 150, K)
    gk2 = np.concatenate([gk, big])
    gv2 = np.concatenate([gv, gv])
    ga2 = np.concatenate([ga, [150.0 * 150.0]]).astype(np.float32)

    # dets: B and C both sit exactly on the large GT; A matches the
    # medium GT. C outscores A. Explicit pred areas keep all three dets
    # inside the M range so the unmatched-det area rule doesn't hide C.
    A = gk.copy()
    B = big.copy()
    C = big.copy() + 0.5
    pk = np.concatenate([A, B, C])
    ps = np.asarray([0.5, 0.95, 0.9], np.float32)
    pa = np.full(3, 40.0 * 40.0, np.float32)
    ap = OKSAP(num_classes=1)
    ap.update(pk, ps, gk2, gv2, ga2, pred_area=pa)
    out = ap.compute()
    # in the M range: B takes the ignored large GT, C becomes an FP that
    # outranks A -> AP_M ~0.5; double-dropping both would report 1.0
    assert out["AP_M"] < 0.9, out


def test_oksap_empty_compute_schema():
    """compute() with no GT returns the full key set at the COCO 'not
    evaluated' sentinel, same schema as the normal path."""
    from tpupose.metrics.oks_ap import OKSAP

    out = OKSAP(num_classes=2).compute()
    for k in ("mAP", "mAP50", "mAP75", "AP_M", "AP_L", "AR", "AR50",
              "AR75", "AR_M", "AR_L"):
        assert out[k] == -1.0, (k, out)
    assert out["per_class"].shape == (2,)
    assert (out["per_class"] == -1.0).all()
