"""Two-stage pipeline (BASELINE config 5 shape): detector boxes ->
on-device crops -> batched top-down pose -> frame coords."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpupose.engine.two_stage import TwoStagePosePredictor, boxes_to_center_scale

# full-model compiles: slow tier (tests/README.md)
pytestmark = pytest.mark.slow


def test_center_scale_matches_host_convention():
    from tpupose.data.coco import CocoTopDownDataset

    ds = CocoTopDownDataset.__new__(CocoTopDownDataset)
    ds.image_size = (256, 192)   # aspect 0.75
    ds.padding = 1.25
    rng = np.random.RandomState(0)
    for _ in range(10):
        x, y = rng.uniform(0, 200, 2)
        w, h = rng.uniform(10, 150, 2)
        c_host, s_host = ds._box_to_center_scale(
            np.array([x, y, w, h], np.float32))
        c_dev, s_dev = boxes_to_center_scale(
            jnp.asarray([x, y, x + w, y + h]), aspect=192 / 256)
        np.testing.assert_allclose(np.asarray(c_dev), c_host, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(s_dev), s_host, rtol=1e-5)


def test_multi_crop_kernel_matches_oracle_interpret():
    from tpupose.ops.affine import batched_affine_warp
    from tpupose.ops.pallas_warp import pallas_crops_from_frames

    B, D, Hf, Wf = 2, 3, 48, 40
    rng = np.random.RandomState(1)
    frames = jnp.asarray(rng.randint(0, 255, (B, Hf, Wf, 3)).astype(np.float32))
    theta = rng.uniform(-0.3, 0.3, B * D)
    mult = rng.uniform(0.5, 1.0, B * D)
    A = np.stack([np.stack([np.cos(theta), -np.sin(theta)], -1),
                  np.stack([np.sin(theta), np.cos(theta)], -1)],
                 -2) * mult[:, None, None]
    t = rng.uniform(0, 10, (B * D, 2))
    mats = jnp.asarray(np.concatenate([A, t[..., None]], -1).astype(np.float32))
    out_size = (16, 16)
    got = pallas_crops_from_frames(frames, mats, out_size, interpret=True)
    rep = jnp.repeat(frames, D, axis=0)
    ref = batched_affine_warp(rep, mats, out_size)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)


def test_crops_from_frames_auto_cpu_content():
    """A crop box around a colored block must return that block."""
    from tpupose.ops.affine import get_affine_matrix_np
    from tpupose.ops.pallas_warp import crops_from_frames_auto

    frame = np.zeros((1, 64, 64, 3), np.float32)
    frame[0, 20:28, 40:48, 0] = 200.0   # red block at x 40-48, y 20-28
    c = np.array([44.0, 24.0], np.float32)
    s = np.array([8.0, 8.0], np.float32)
    m = get_affine_matrix_np(c, s, 0.0, (8, 8))[None]
    crop = np.asarray(crops_from_frames_auto(
        jnp.asarray(frame), jnp.asarray(m), (8, 8)))[0]
    assert crop[..., 0].mean() > 150.0      # mostly the red block
    assert crop[..., 1].max() == 0.0


def test_two_stage_predictor_shapes_and_backprojection():
    import optax

    from tpupose.engine.train_state import create_train_state
    from tpupose.models.simple_baseline import SimpleBaseline

    K = 4
    model = SimpleBaseline(backbone="resnet18", num_keypoints=K,
                           deconv_channels=(32, 32, 32), dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), optax.sgd(0.0))
    pred = TwoStagePosePredictor(state, crop_size=(64, 64),
                                 heatmap_size=(16, 16), max_persons=3)
    frames = np.random.RandomState(0).randint(
        0, 255, (2, 96, 96, 3)).astype(np.uint8)
    boxes = np.array([[[10, 10, 50, 70], [30, 20, 80, 90], [0, 0, 0, 0]],
                      [[5, 5, 60, 60], [0, 0, 0, 0], [0, 0, 0, 0]]],
                     np.float32)
    valid = np.array([[1, 1, 0], [1, 0, 0]], np.float32)
    coords, scores = pred.pose_from_boxes(frames, boxes, valid)
    assert coords.shape == (2, 3, K, 2) and scores.shape == (2, 3, K)
    # valid crops back-project into (roughly) their padded person box
    c0 = coords[0, 0]
    assert (c0[:, 0] > -30).all() and (c0[:, 0] < 100).all()
    assert np.isfinite(coords).all() and np.isfinite(scores).all()


def test_two_stage_with_detector():
    import optax

    from tpupose.engine.train_state import create_train_state
    from tpupose.models.simple_baseline import SimpleBaseline

    K = 4

    class FakeDetector:
        def __call__(self, frames):
            B = frames.shape[0]
            boxes = np.tile(np.array([[8, 8, 56, 56]], np.float32), (B, 5, 1))
            return {"boxes": boxes,
                    "scores": np.ones((B, 5), np.float32),
                    "valid": np.tile(np.array([1, 1, 0, 0, 0], bool), (B, 1))}

    model = SimpleBaseline(backbone="resnet18", num_keypoints=K,
                           deconv_channels=(32, 32, 32), dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), optax.sgd(0.0))
    pred = TwoStagePosePredictor(state, crop_size=(64, 64),
                                 heatmap_size=(16, 16), max_persons=4,
                                 detector=FakeDetector())
    out = pred(np.zeros((2, 64, 64, 3), np.uint8))
    assert out["keypoints"].shape == (2, 4, K, 3)
    assert out["boxes"].shape == (2, 4, 4)
    assert out["valid"].shape == (2, 4)
