"""ROI mean-pool appearance embeddings (ops/roi.py) and their wiring
through the detector predictor — the on-device DINO-feature tracking
signal (reference surface: pose/dino_tracking.ipynb, BASELINE config 5)."""

import jax.numpy as jnp
import numpy as np
import pytest

# full-model compiles: slow tier (tests/README.md)
pytestmark = pytest.mark.slow


def naive_roi_mean(fmap, boxes, image_size):
    """Loop oracle for roi_mean_pool (identical cell rounding/clamping)."""
    B, h, w, C = fmap.shape
    H, W = image_size
    sx, sy = w / W, h / H
    out = np.zeros(boxes.shape[:2] + (C,), np.float32)
    for b in range(B):
        for d in range(boxes.shape[1]):
            bx = boxes[b, d]
            x0 = int(np.clip(np.floor(bx[0] * sx), 0, w - 1))
            y0 = int(np.clip(np.floor(bx[1] * sy), 0, h - 1))
            x1 = int(np.clip(np.ceil(bx[2] * sx), x0 + 1, w))
            y1 = int(np.clip(np.ceil(bx[3] * sy), y0 + 1, h))
            out[b, d] = fmap[b, y0:y1, x0:x1].astype(np.float32).mean((0, 1))
    return out


def test_roi_mean_pool_matches_oracle():
    from tpupose.ops.roi import roi_mean_pool

    rng = np.random.RandomState(0)
    B, h, w, C = 2, 5, 7, 6
    H, W = 80, 112
    fmap = rng.randn(B, h, w, C).astype(np.float32)
    # mix of normal, tiny (sub-cell), clamped-out-of-range, and zero boxes
    boxes = np.stack([
        np.array([[10, 10, 60, 70], [0, 0, 1, 1],
                  [-5, -9, 200, 150], [0, 0, 0, 0]], np.float32),
        np.array([[30, 5, 100, 40], [50, 50, 51, 51],
                  [0, 0, 112, 80], [111, 79, 112, 80]], np.float32),
    ])
    got = np.asarray(roi_mean_pool(jnp.asarray(fmap), jnp.asarray(boxes),
                                   (H, W), l2_normalize=False))
    want = naive_roi_mean(fmap, boxes, (H, W))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # normalized variant: unit length
    gotn = np.asarray(roi_mean_pool(jnp.asarray(fmap), jnp.asarray(boxes),
                                    (H, W)))
    np.testing.assert_allclose(np.linalg.norm(gotn, axis=-1), 1.0, atol=1e-4)


def test_roi_pool_constant_map_is_exact():
    """A constant feature map pools to exactly that constant for any box."""
    from tpupose.ops.roi import roi_mean_pool

    fmap = np.full((1, 8, 8, 3), 2.5, np.float32)
    boxes = np.array([[[3, 3, 50, 60], [0, 0, 64, 64]]], np.float32)
    got = np.asarray(roi_mean_pool(jnp.asarray(fmap), jnp.asarray(boxes),
                                   (64, 64), l2_normalize=False))
    np.testing.assert_allclose(got, 2.5, rtol=1e-6)


@pytest.fixture(scope="module")
def det_predictor():
    import jax
    import optax

    from tpupose.engine.predictor import YoloPosePredictor
    from tpupose.engine.train_state import create_train_state
    from tpupose.models.dinov3_pose import DINOv3Pose

    model = DINOv3Pose(backbone="dinov3_convnext_atto", num_keypoints=4,
                       num_classes=2, neck_channels=(48, 96, 192),
                       dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), optax.sgd(0.0))
    return YoloPosePredictor(state, num_classes=2, num_keypoints=4,
                             conf_threshold=0.0, max_detections=8,
                             appearance=True)


def test_predictor_appearance_features(det_predictor):
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    det = det_predictor(imgs)
    assert "features" in det
    feats = det["features"]
    # convnext_atto deepest stage has 320 channels
    assert feats.shape == (2, 8, 320)
    assert np.isfinite(feats.astype(np.float32)).all()
    # embeddings are L2-normalized on device (bf16 on the wire)
    np.testing.assert_allclose(np.linalg.norm(feats.astype(np.float32),
                                              axis=-1), 1.0, atol=2e-2)
    # appearance must describe WHERE the box looks: two different valid
    # detections in the same image should not be byte-identical unless
    # their boxes coincide
    v = det["valid"][0]
    if v.sum() >= 2:
        i, j = np.where(v)[0][:2]
        if not np.allclose(det["boxes"][0, i], det["boxes"][0, j]):
            assert not np.allclose(feats[0, i], feats[0, j])


def test_predictor_appearance_vit_backbone():
    """The capture path also handles the DinoViT backbone, whose output is
    a dict of per-block intermediates (deepest block is pooled)."""
    import jax
    import optax

    from tpupose.engine.predictor import YoloPosePredictor
    from tpupose.engine.train_state import create_train_state
    from tpupose.models.dinov3_pose import DINOv3Pose

    model = DINOv3Pose(backbone="dinov3_vit_small", num_keypoints=4,
                       num_classes=2, neck_channels=(48, 96, 192),
                       dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), optax.sgd(0.0))
    pred = YoloPosePredictor(state, num_classes=2, num_keypoints=4,
                             conf_threshold=0.0, max_detections=4,
                             appearance=True)
    imgs = np.random.RandomState(0).randint(
        0, 255, (1, 64, 64, 3)).astype(np.uint8)
    det = pred(imgs)
    assert det["features"].shape == (1, 4, 384)   # vit_small dim
    assert np.isfinite(det["features"].astype(np.float32)).all()


def test_two_stage_passes_features_through(det_predictor):
    import jax
    import optax

    from tpupose.engine.two_stage import TwoStagePosePredictor
    from tpupose.engine.train_state import create_train_state
    from tpupose.models.simple_baseline import SimpleBaseline

    pmodel = SimpleBaseline(backbone="resnet18", num_keypoints=4,
                            dtype=jnp.float32)
    pstate = create_train_state(pmodel, jax.random.PRNGKey(1),
                                jnp.zeros((1, 64, 64, 3)), optax.sgd(0.0))
    ts = TwoStagePosePredictor(pstate, crop_size=(64, 64),
                               heatmap_size=(16, 16), max_persons=4)
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    out = ts.fetch(ts.dispatch_from_det(
        imgs, det_predictor.dispatch(imgs)))
    assert out["features"].shape == (2, 4, 320)
    assert out["keypoints"].shape == (2, 4, 4, 3)
