import jax
import jax.numpy as jnp
import numpy as np

from tpupose.ops.decode import (
    dark_refine, decode_heatmaps, flip_back, gaussian_blur, get_max_preds,
    merge_flip, quarter_offset_refine,
)
from tpupose.ops.heatmap import gaussian_heatmaps, heatmap_target_weights


def _targets(joints, vis, size=(64, 48), sigma=2.0, unbiased=True):
    return gaussian_heatmaps(jnp.asarray(joints), jnp.asarray(vis), size,
                             sigma, unbiased=unbiased)


def test_gaussian_peak_location_and_amplitude():
    joints = np.array([[[10.0, 20.0], [30.5, 40.25]]])
    vis = np.ones((1, 2))
    hm, w = _targets(joints, vis)
    hm = np.asarray(hm)
    assert hm.shape == (1, 2, 64, 48)
    # integer joint: exact peak of 1.0 at (y=20, x=10)
    assert hm[0, 0, 20, 10] == np.max(hm[0, 0]) >= 0.999
    np.testing.assert_allclose(np.asarray(w), 1.0)


def test_gaussian_invisible_joint_is_zero():
    joints = np.array([[[10.0, 20.0]]])
    hm, w = _targets(joints, np.zeros((1, 1)))
    assert float(jnp.max(hm)) == 0.0
    assert float(w[0, 0]) == 0.0


def test_target_weight_outside_map():
    joints = np.array([[[500.0, 500.0]]])
    w = heatmap_target_weights(jnp.asarray(joints), jnp.ones((1, 1)), (64, 48))
    assert not bool(w[0, 0])


def test_argmax_decode_roundtrip():
    joints = np.array([[[10.0, 20.0], [30.0, 40.0], [5.0, 5.0]]])
    hm, _ = _targets(joints, np.ones((1, 3)))
    coords, vals = get_max_preds(hm)
    np.testing.assert_allclose(np.asarray(coords[0]), joints[0], atol=0.01)
    assert np.all(np.asarray(vals) > 0.99)


def test_dark_recovers_subpixel():
    """DARK on an unbiased float-center Gaussian should recover the true
    sub-pixel location to well under a quarter pixel."""
    true = np.array([[[10.3, 20.7], [30.6, 17.2], [25.25, 40.75]]])
    hm, _ = _targets(true, np.ones((1, 3)), sigma=2.0)
    coords, _ = decode_heatmaps(hm, method="dark", blur_kernel=11, sigma=2.0)
    err = np.abs(np.asarray(coords[0]) - true[0])
    assert err.max() < 0.1, err


def test_dark_beats_quarter_offset():
    rng = np.random.RandomState(3)
    true = rng.uniform([5, 5], [42, 58], size=(8, 17, 2))[..., ::-1].copy()
    true = np.ascontiguousarray(true)
    hm, _ = _targets(true, np.ones((8, 17)))
    c_dark, _ = decode_heatmaps(hm, "dark")
    c_q, _ = decode_heatmaps(hm, "quarter_offset")
    e_dark = np.abs(np.asarray(c_dark) - true).mean()
    e_q = np.abs(np.asarray(c_q) - true).mean()
    assert e_dark < e_q


def test_quarter_offset_moves_toward_peak():
    true = np.array([[[10.4, 20.0]]])
    hm, _ = _targets(true, np.ones((1, 1)))
    coords, _ = get_max_preds(hm)
    ref = quarter_offset_refine(hm, coords)
    assert float(ref[0, 0, 0]) == float(coords[0, 0, 0]) + 0.25


def test_gaussian_blur_preserves_peak_amplitude():
    joints = np.array([[[24.0, 32.0]]])
    hm, _ = _targets(joints, np.ones((1, 1)))
    blurred = gaussian_blur(hm, 11, 2.0)
    np.testing.assert_allclose(float(jnp.max(blurred)), float(jnp.max(hm)), rtol=1e-5)


def test_flip_back_swaps_pairs_and_unflips():
    B, K, H, W = 1, 4, 8, 8
    hm = np.zeros((B, K, H, W), np.float32)
    hm[0, 0, 2, 1] = 1.0  # channel 0 peak at x=1
    flipped = hm[..., ::-1].copy()
    # pairs (0,1): after flip_back channel 1 should hold the peak
    out = flip_back(jnp.asarray(flipped), np.array([[0, 1]]), shift=False)
    out = np.asarray(out)
    assert out[0, 1, 2, 1] == 1.0
    assert out[0, 0].max() == 0.0


def test_merge_flip_identity_on_symmetric():
    joints = np.array([[[24.0, 32.0]]])  # horizontally centered -> symmetric
    hm, _ = _targets(joints, np.ones((1, 1)), size=(64, 48))
    # simulate the flipped forward output = horizontally flipped heatmap
    flipped = hm[..., ::-1]
    merged = merge_flip(hm, flipped, np.zeros((0, 2), np.int64))
    coords, _ = get_max_preds(merged)
    # peak stays within the shift tolerance of the true center
    assert abs(float(coords[0, 0, 0]) - 24.0) <= 1.0


def test_decode_jits():
    joints = np.array([[[10.0, 20.0]]])
    hm, _ = _targets(joints, np.ones((1, 1)))
    f = jax.jit(lambda h: decode_heatmaps(h, "dark"))
    coords, vals = f(hm)
    assert coords.shape == (1, 1, 2)
