"""On-device rotation/scale augmentation (BASELINE config 3's "on-device
affine augmentation pipeline"): geometry consistency between the batched
image warp and the joint-label transform, identity behavior, visibility
rules, train-step wiring, and the host-side geometry skip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpupose.ops.affine import random_affine_augment

# full-model compiles: slow tier (tests/README.md)
pytestmark = pytest.mark.slow


def test_identity_when_factors_zero():
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (2, 32, 24, 3)).astype(np.uint8)
    joints = rng.uniform(1, 5, (2, 4, 2)).astype(np.float32)
    vis = np.ones((2, 4), np.float32)
    out, j, v = random_affine_augment(
        jnp.asarray(imgs), jnp.asarray(joints), jnp.asarray(vis),
        jax.random.PRNGKey(0), 0.0, 0.0, (8, 6))
    np.testing.assert_allclose(np.asarray(out), imgs.astype(np.float32),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(j), joints, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), vis)


def test_image_and_labels_move_together():
    """A bright dot at the joint must land at the transformed joint."""
    B, H, W = 4, 64, 48
    Hh, Wh = 16, 12
    ratio = H // Hh
    rng = np.random.RandomState(1)
    joints = np.stack([rng.uniform(3, Wh - 3, (B, 1)),
                       rng.uniform(3, Hh - 3, (B, 1))], -1).astype(np.float32)
    imgs = np.zeros((B, H, W, 3), np.float32)
    for b in range(B):
        x, y = joints[b, 0] * ratio  # heatmap px -> image px
        imgs[b, int(round(y)), int(round(x))] = 255.0
    vis = np.ones((B, 1), np.float32)
    out, j, v = random_affine_augment(
        jnp.asarray(imgs), jnp.asarray(joints), jnp.asarray(vis),
        jax.random.PRNGKey(7), 30.0, 0.25, (Hh, Wh))
    out, j, v = map(np.asarray, (out, j, v))
    for b in range(B):
        if v[b, 0] == 0:
            continue
        flat = out[b, :, :, 0].argmax()
        py, px = np.unravel_index(flat, (H, W))
        ex, ey = j[b, 0] * ratio
        # bilinear spread + rounding: within ~2 px (scale can shrink the dot)
        assert abs(px - ex) <= 2.5 and abs(py - ey) <= 2.5, \
            (b, px, py, ex, ey)


def test_out_of_bounds_joints_lose_visibility():
    B, Hh, Wh = 8, 8, 8
    joints = np.tile(np.array([[0.5, 0.5]], np.float32), (B, 1, 1))  # corner
    imgs = np.zeros((B, 32, 32, 3), np.float32)
    vis = np.ones((B, 1), np.float32)
    # large rotations about the center push a corner joint out of bounds
    # for some draws
    _, j, v = random_affine_augment(
        jnp.asarray(imgs), jnp.asarray(joints), jnp.asarray(vis),
        jax.random.PRNGKey(3), 90.0, 0.0, (Hh, Wh))
    j, v = np.asarray(j), np.asarray(v)
    inside = ((j[..., 0] >= 0) & (j[..., 0] < Wh)
              & (j[..., 1] >= 0) & (j[..., 1] < Hh))
    np.testing.assert_array_equal(v > 0, inside)


def test_train_step_wiring_and_determinism():
    import optax

    from tpupose.engine.train_state import (create_train_state,
                                            make_heatmap_train_step)
    from tpupose.losses.heatmap import joints_mse_loss
    from tpupose.models.simple_baseline import SimpleBaseline

    K = 4
    model = SimpleBaseline(backbone="resnet18", num_keypoints=K,
                           deconv_channels=(32, 32, 32), dtype=jnp.float32)
    tx = optax.sgd(1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), tx)
    rng = np.random.RandomState(0)
    batch = {
        "images": rng.randint(0, 255, (4, 64, 64, 3)).astype(np.uint8),
        "joints": rng.uniform(3, 13, (4, K, 2)).astype(np.float32),
        "visibility": np.ones((4, K), np.float32),
    }
    step_aff = make_heatmap_train_step(
        joints_mse_loss, heatmap_size=(16, 16),
        affine_rotation=30.0, affine_scale=0.25)
    step_plain = make_heatmap_train_step(joints_mse_loss, heatmap_size=(16, 16))

    def clone(s):  # the step donates its state buffer
        return jax.tree_util.tree_map(lambda x: jnp.array(x), s)

    # deterministic: same state+batch -> identical loss
    _, m1 = step_aff(clone(state), batch)
    _, m2 = step_aff(clone(state), batch)
    assert float(m1["loss"]) == float(m2["loss"])
    # augmentation actually changes the rendered problem
    _, mp = step_plain(clone(state), batch)
    assert float(m1["loss"]) != float(mp["loss"])


def test_precomputed_targets_rejected():
    from tpupose.engine.train_state import make_heatmap_train_step
    from tpupose.losses.heatmap import joints_mse_loss

    step = make_heatmap_train_step(joints_mse_loss, heatmap_size=(8, 8),
                                   affine_rotation=30.0)
    with pytest.raises(ValueError):
        step(None, {"images": np.zeros((1, 32, 32, 3), np.uint8),
                    "target": np.zeros((1, 8, 8, 4), np.float32)})


def test_host_geometry_skip(tmp_path):
    """augment_geometry=False: host applies flip only (device owns
    rotation/scale)."""
    from tests.test_mpii import _write_mpii
    from tpupose.data.mpii import MpiiTopDownDataset

    _write_mpii(str(tmp_path))
    kw = dict(image_dir=str(tmp_path / "images"),
              ann_file=str(tmp_path / "annot" / "train.json"),
              image_size=(64, 64), heatmap_size=(16, 16), is_train=True,
              scale_factor=0.5, rotation_factor=45.0, flip_prob=0.0, seed=0)
    ds_off = MpiiTopDownDataset(augment_geometry=False, **kw)
    _, c0, s0, rot, _, _, _ = ds_off._sample_params(0)
    base_c, base_s = ds_off._center_scale(ds_off.samples[0])
    assert rot == 0.0
    np.testing.assert_allclose(s0, base_s)
    np.testing.assert_allclose(c0, base_c)
    ds_on = MpiiTopDownDataset(augment_geometry=True, **kw)
    _, _, s1, _, _, _, _ = ds_on._sample_params(0)
    assert not np.allclose(s1, base_s)  # jitter applied on host path
