"""Fused Pallas stem (conv7x7/2 + BN + relu + maxpool3x3/2) correctness
vs the flax stem oracle, and the full-model composed serving forward.

Runs on CPU via the Pallas interpreter (interpret=None auto-selects);
the TPU-compiled path is exercised by bench.py / scripts/r4_stem_e2e.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpupose.models.simple_baseline import SimpleBaseline
from tpupose.ops.pallas_stem import (fast_r50_stem_apply, fold_stem_weights,
                                     fused_stem_apply, stem_reference,
                                     stem_s2d)


@pytest.fixture(scope="module")
def r50():
    model = SimpleBaseline(backbone="resnet50", num_keypoints=17,
                           dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 256, 192, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    # non-trivial BN statistics so the fold is actually tested
    rs = np.random.RandomState(1)
    bn = variables["batch_stats"]["ResNet_0"]["BatchNorm_0"]
    bn["mean"] = jnp.asarray(rs.normal(0, 0.3, bn["mean"].shape), jnp.float32)
    bn["var"] = jnp.asarray(rs.uniform(0.5, 2.0, bn["var"].shape),
                            jnp.float32)
    return model, variables


def test_s2d_is_a_permutation():
    rs = np.random.RandomState(0)
    x = rs.randn(2, 256, 192, 3).astype(np.float32)
    x4 = np.asarray(stem_s2d(jnp.asarray(x)))
    assert x4.shape == (2, 66, 50, 64)
    xp = np.pad(x, ((0, 0), (3, 5), (3, 5), (0, 0)))
    for u, v, t, s, c in [(0, 0, 0, 0, 0), (10, 11, 2, 3, 1),
                          (65, 49, 3, 3, 2), (33, 20, 1, 2, 0)]:
        assert x4[1, u, v, t * 12 + s * 3 + c] == xp[1, 4 * u + t, 4 * v + s, c]
    assert (x4[..., 48:] == 0).all()


def test_fused_stem_matches_flax_stem(r50):
    _, variables = r50
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.uniform(-2, 2, (2, 256, 192, 3)), jnp.float32)
    ref = np.asarray(stem_reference(variables, x), np.float32)
    w = fold_stem_weights(variables)
    got = np.asarray(
        fused_stem_apply(x.astype(jnp.bfloat16), w, interpret=True),
        np.float32)
    assert got.shape == (2, 64, 48, 128)
    assert (got[..., 64:] == 0).all()
    np.testing.assert_allclose(got[..., :64], ref, rtol=0.05, atol=0.05)
    # tight agreement in aggregate (bf16 matmul accumulation in f32)
    denom = max(np.abs(ref).max(), 1e-6)
    assert np.abs(got[..., :64] - ref).mean() / denom < 5e-3


def test_fused_stem_group1_matches(r50):
    _, variables = r50
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.uniform(-2, 2, (1, 256, 192, 3)), jnp.float32)
    ref = np.asarray(stem_reference(variables, x), np.float32)
    w = fold_stem_weights(variables)
    got = np.asarray(
        fused_stem_apply(x.astype(jnp.bfloat16), w, interpret=True,
                         group=1, out_channels=64), np.float32)
    assert got.shape == (1, 64, 48, 64)
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)


def test_input_affine_fold(r50):
    """Folding the uint8 normalize into the stem weights: kernel on raw
    pixel values == flax stem on normalized values."""
    from tpupose.ops.preprocess import normalize_images

    _, variables = r50
    rs = np.random.RandomState(4)
    imgs = rs.randint(0, 256, (2, 256, 192, 3)).astype(np.uint8)
    xn = normalize_images(jnp.asarray(imgs))
    ref = np.asarray(stem_reference(variables, xn), np.float32)
    # normalize_images: (x/255 - mean)/std == (x - 255*mean) * 1/(255*std)
    from tpupose.ops.pallas_stem import center_raw

    std = np.array([0.229, 0.224, 0.225])
    w = fold_stem_weights(variables, input_scale=1.0 / (255.0 * std))
    xc = center_raw(jnp.asarray(imgs)).astype(jnp.bfloat16)
    got = np.asarray(
        fused_stem_apply(xc, w, interpret=True, out_channels=64),
        np.float32)
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.07)


def test_full_model_with_fused_stem(r50):
    """Composed serving forward (Pallas stem + Pallas layer1, bf16) vs
    the plain flax forward on the whole SimpleBaseline-R50."""
    model, variables = r50
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.uniform(-2, 2, (2, 256, 192, 3)), jnp.bfloat16)
    ref = np.asarray(model.apply(variables, x, train=False), np.float32)
    got = np.asarray(
        fast_r50_stem_apply(model.apply, variables, None, x, train=False),
        np.float32)
    assert got.shape == ref.shape
    denom = max(np.abs(ref).max(), 1e-6)
    assert np.abs(got - ref).max() / denom < 0.06
    assert np.abs(got - ref).mean() / denom < 5e-3
