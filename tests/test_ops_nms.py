import jax
import jax.numpy as jnp
import numpy as np

from tpupose.ops.nms import batched_pose_nms, box_iou, nms


def test_box_iou_known_values():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0],
                   [20.0, 20.0, 30.0, 30.0]])
    iou = np.asarray(box_iou(a, b))[0]
    np.testing.assert_allclose(iou[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(iou[1], 25.0 / 175.0, atol=1e-6)
    np.testing.assert_allclose(iou[2], 0.0, atol=1e-6)


def test_nms_suppresses_overlap_keeps_best():
    boxes = jnp.array([
        [0.0, 0.0, 10.0, 10.0],
        [1.0, 1.0, 11.0, 11.0],   # heavy overlap with box 0
        [20.0, 20.0, 30.0, 30.0],
    ])
    scores = jnp.array([0.9, 0.8, 0.7])
    keep = np.asarray(nms(boxes, scores, 0.5))
    assert keep.tolist() == [True, False, True]


def test_nms_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    N = 64
    xy = rng.uniform(0, 100, (N, 2))
    wh = rng.uniform(5, 30, (N, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(size=N).astype(np.float32)

    def oracle(boxes, scores, thr):
        order = np.argsort(-scores)
        keep = np.zeros(N, bool)
        for i in order:
            ok = True
            for j in np.where(keep)[0]:
                x1 = max(boxes[i, 0], boxes[j, 0]); y1 = max(boxes[i, 1], boxes[j, 1])
                x2 = min(boxes[i, 2], boxes[j, 2]); y2 = min(boxes[i, 3], boxes[j, 3])
                inter = max(x2 - x1, 0) * max(y2 - y1, 0)
                a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
                if inter / (a + b - inter) > thr:
                    ok = False
                    break
            keep[i] = ok
        return keep

    got = np.asarray(nms(jnp.asarray(boxes), jnp.asarray(scores), 0.45))
    want = oracle(boxes, scores, 0.45)
    np.testing.assert_array_equal(got, want)


def test_batched_pose_nms_static_shapes_and_classes():
    N, K, max_det = 32, 4, 8
    rng = np.random.RandomState(1)
    boxes = rng.uniform(0, 50, (N, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + 10
    scores = rng.uniform(size=N).astype(np.float32)
    classes = rng.randint(0, 3, N).astype(np.int32)
    kpts = rng.uniform(0, 50, (N, K, 3)).astype(np.float32)

    fn = jax.jit(lambda b, s, c, k: batched_pose_nms(b, s, c, k, max_det=max_det))
    ob, os_, oc, ok, ov = fn(boxes, scores, classes, kpts)
    assert ob.shape == (max_det, 4)
    assert ok.shape == (max_det, K, 3)
    v = np.asarray(ov)
    # valid entries sorted by score desc
    s = np.asarray(os_)[v]
    assert np.all(np.diff(s) <= 1e-6)
    # same-class identical boxes should suppress; distinct classes don't:
    bb = jnp.asarray(np.tile(np.array([[0, 0, 10, 10]], np.float32), (2, 1)))
    ss = jnp.asarray(np.array([0.9, 0.8], np.float32))
    kk = jnp.zeros((2, K, 3), jnp.float32)
    _, _, _, _, v_same = batched_pose_nms(bb, ss, jnp.array([0, 0]), kk, max_det=4)
    _, _, _, _, v_diff = batched_pose_nms(bb, ss, jnp.array([0, 1]), kk, max_det=4)
    assert int(np.sum(np.asarray(v_same))) == 1
    assert int(np.sum(np.asarray(v_diff))) == 2
