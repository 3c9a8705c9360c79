import jax.numpy as jnp
import numpy as np

from tpupose.ops.affine import (
    affine_transform_points, affine_warp, get_affine_matrix, invert_affine,
    transform_preds,
)


def test_identity_warp():
    # crop that exactly covers the source -> identity resample
    img = np.random.RandomState(0).uniform(0, 255, (32, 24, 3)).astype(np.float32)
    m = get_affine_matrix(jnp.array([12.0, 16.0]), jnp.array([24.0, 32.0]), 0.0, (32, 24))
    out = affine_warp(jnp.asarray(img), m, (32, 24))
    # interior pixels should match almost exactly (0.5px sampling offset at
    # the dst-center convention keeps borders approximate)
    diff = np.abs(np.asarray(out)[4:-4, 4:-4] - img[4:-4, 4:-4])
    assert diff.mean() < 3.0


def test_matrix_center_maps_to_output_center():
    c = jnp.array([100.0, 50.0])
    s = jnp.array([80.0, 120.0])
    m = get_affine_matrix(c, s, 30.0, (64, 48))
    src = affine_transform_points(jnp.array([24.0, 32.0]), m)  # dst center
    np.testing.assert_allclose(np.asarray(src), np.asarray(c), atol=1e-4)


def test_rotation_preserves_distance_ratio():
    c = jnp.array([50.0, 50.0])
    s = jnp.array([48.0, 64.0])
    m0 = get_affine_matrix(c, s, 0.0, (64, 48))
    m90 = get_affine_matrix(c, s, 90.0, (64, 48))
    p = jnp.array([30.0, 32.0])
    d0 = jnp.linalg.norm(affine_transform_points(p, m0) - c)
    d90 = jnp.linalg.norm(affine_transform_points(p, m90) - c)
    np.testing.assert_allclose(float(d0), float(d90), rtol=1e-5)


def test_invert_affine_roundtrip():
    m = get_affine_matrix(jnp.array([10.0, 20.0]), jnp.array([30.0, 40.0]), 17.0, (64, 48))
    minv = invert_affine(m)
    p = jnp.array([[5.0, 7.0], [13.0, 29.0]])
    q = affine_transform_points(affine_transform_points(p, m), minv)
    np.testing.assert_allclose(np.asarray(q), np.asarray(p), atol=1e-4)


def test_transform_preds_scales_heatmap_to_source():
    # heatmap 64x48 covering a crop centered at (96, 128) of size (192, 256)
    center = jnp.array([96.0, 128.0])
    scale = jnp.array([192.0, 256.0])
    coords = jnp.array([[24.0, 32.0]])  # heatmap center
    out = transform_preds(coords, center, scale, (64, 48))
    np.testing.assert_allclose(np.asarray(out[0]), [96.0, 128.0], atol=1e-4)
    # one heatmap px right = 192/48 = 4 src px
    out2 = transform_preds(jnp.array([[25.0, 32.0]]), center, scale, (64, 48))
    np.testing.assert_allclose(float(out2[0, 0] - out[0, 0]), 4.0, atol=1e-4)


def test_warp_zero_fill_outside():
    img = jnp.ones((16, 16, 1), jnp.float32) * 100.0
    # crop window entirely outside the image
    m = get_affine_matrix(jnp.array([100.0, 100.0]), jnp.array([8.0, 8.0]), 0.0, (8, 8))
    out = affine_warp(img, m, (8, 8))
    assert float(jnp.max(jnp.abs(out))) == 0.0


def test_affine_matrix_np_matches_jax():
    """The host (NumPy) matrix must equal the device (jax) matrix — the
    COCO dataset uses the NumPy twin so __getitem__ never dispatches a
    device op."""
    import numpy as np
    import jax.numpy as jnp

    from tpupose.ops.affine import get_affine_matrix, get_affine_matrix_np

    rng = np.random.RandomState(0)
    for _ in range(5):
        c = rng.uniform(50, 300, 2).astype(np.float32)
        s = rng.uniform(80, 400, 2).astype(np.float32)
        r = float(rng.uniform(-45, 45))
        a = np.asarray(get_affine_matrix(jnp.asarray(c), jnp.asarray(s),
                                         r, (64, 48)))
        b = get_affine_matrix_np(c, s, r, (64, 48))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)
