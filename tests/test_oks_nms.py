"""OKS-NMS (ops/oks_nms.py): pairwise OKS values, hard greedy
suppression, soft Gaussian rescoring, and the det-eval integration."""

import numpy as np


def _pose(cx, cy, K=17, spread=10.0, seed=0):
    rng = np.random.RandomState(seed)
    return np.stack([cx + rng.uniform(-spread, spread, K),
                     cy + rng.uniform(-spread, spread, K)], -1).astype(np.float32)


def test_oks_iou_values():
    from tpupose.ops.oks_nms import oks_iou

    p = _pose(100, 100)
    # identical pose -> OKS 1; far pose -> ~0
    far = p + 1000.0
    ious = oks_iou(p, np.stack([p, far]), 5000.0, np.array([5000.0, 5000.0]))
    np.testing.assert_allclose(ious[0], 1.0, atol=1e-6)
    assert ious[1] < 1e-6
    # hand value for a single-joint shift: exp(-d^2 / (2*s*(2*sigma)^2))
    one = np.zeros((1, 2), np.float32)
    shifted = np.array([[[3.0, 4.0]]], np.float32)  # d^2 = 25
    sig = np.array([0.1], np.float32)
    got = oks_iou(one, shifted, 100.0, np.array([100.0]), sigmas=sig)
    want = np.exp(-25.0 / (2 * 100.0 * 0.04))
    np.testing.assert_allclose(got[0], want, rtol=1e-5)


def test_oks_iou_vis_threshold_masks_joints():
    from tpupose.ops.oks_nms import oks_iou

    p = _pose(100, 100, K=4)
    q = p.copy()
    q[2:] += 500.0  # joints 2,3 wildly off
    ks_p = np.array([0.9, 0.9, 0.9, 0.9], np.float32)
    ks_q = np.array([0.9, 0.9, 0.1, 0.1], np.float32)
    full = oks_iou(p, q[None], 5000.0, np.array([5000.0]))
    gated = oks_iou(p, q[None], 5000.0, np.array([5000.0]),
                    kscores=ks_p, other_kscores=ks_q[None],
                    vis_threshold=0.2)
    assert full[0] < 0.6                       # off joints drag OKS down
    np.testing.assert_allclose(gated[0], 1.0, atol=1e-6)  # gated out


def test_oks_nms_suppresses_duplicates():
    from tpupose.ops.oks_nms import oks_nms

    a = _pose(100, 100)
    dup = a + 0.5                    # near-duplicate of a
    b = _pose(400, 400, seed=1)      # distinct person
    kpts = np.stack([a, dup, b])
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    areas = np.full(3, 5000.0, np.float32)
    keep = oks_nms(kpts, scores, areas, threshold=0.9)
    assert list(keep) == [0, 2]
    # threshold above the duplicate's OKS keeps everything
    keep_all = oks_nms(kpts, scores, areas, threshold=0.9999)
    assert sorted(keep_all.tolist()) == [0, 1, 2]


def test_soft_oks_nms_rescoring():
    from tpupose.ops.oks_nms import oks_iou, soft_oks_nms

    a = _pose(100, 100)
    dup = a + 0.5
    b = _pose(400, 400, seed=1)
    kpts = np.stack([a, dup, b])
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    areas = np.full(3, 5000.0, np.float32)
    keep, rescored = soft_oks_nms(kpts, scores, areas, sigma_ns=0.1,
                                  score_threshold=0.0)
    by_idx = dict(zip(keep.tolist(), rescored.tolist()))
    # top instance untouched; distinct person ~untouched; duplicate decayed
    np.testing.assert_allclose(by_idx[0], 0.9, atol=1e-6)
    np.testing.assert_allclose(by_idx[2], 0.7, atol=1e-3)
    iou = float(oks_iou(a, dup[None], 5000.0, areas[:1])[0])
    np.testing.assert_allclose(by_idx[1],
                               0.8 * np.exp(-(iou ** 2) / 0.1), rtol=1e-4)
    # hard score floor drops the duplicate entirely
    keep2, _ = soft_oks_nms(kpts, scores, areas, sigma_ns=0.1,
                            score_threshold=0.5)
    assert sorted(keep2.tolist()) == [0, 2]
