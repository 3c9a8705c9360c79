"""ViT backbone path (RoPE, storage tokens, intermediates), the
DINOv3Pose-with-ViT composition, and DeepPose."""

import jax
import jax.numpy as jnp
import numpy as np

import pytest

# full-model compiles: slow tier (tests/README.md)
pytestmark = pytest.mark.slow


def test_dinovit_outputs_and_rope_shapes():
    from tpupose.models.backbones.vit import DinoViT, rope_2d_sincos

    m = DinoViT(depth=2, dim=64, heads=4, patch_size=16,
                num_storage_tokens=4, intermediates=(0, 1), dtype=jnp.float32)
    x = jnp.zeros((2, 64, 48, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out["cls"].shape == (2, 64)
    assert out["storage"].shape == (2, 4, 64)
    assert out["patches"].shape == (2, 4 * 3, 64)
    assert out["feature_map"].shape == (2, 4, 3, 64)
    assert set(out["intermediates"]) == {0, 1}
    sin, cos = rope_2d_sincos(4, 3, 16)
    assert sin.shape == (12, 8)
    np.testing.assert_allclose(np.asarray(sin) ** 2 + np.asarray(cos) ** 2,
                               1.0, atol=1e-6)


def test_rope_is_relative():
    """RoPE dot products depend only on relative position: shifting both
    q and k by the same offset preserves q.k."""
    from tpupose.models.backbones.vit import apply_rope, rope_2d_sincos

    sin, cos = rope_2d_sincos(1, 8, 16)  # 1x8 grid, head_dim 16
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, 8, 1, 16), jnp.float32)
    qr = apply_rope(q, sin, cos)
    # <r(q,i), r(k,j)> == <r(q,i+d), r(k,j+d)>
    a = float(jnp.dot(qr[0, 1, 0], qr[0, 3, 0]))
    b_q = apply_rope(jnp.roll(q, 2, axis=1), sin, cos)
    b = float(jnp.dot(b_q[0, 3, 0], b_q[0, 5, 0]))
    np.testing.assert_allclose(a, b, rtol=1e-4)


def test_dinov3pose_vit_backbone_forward():
    from tpupose.models.dinov3_pose import DINOv3Pose

    m = DINOv3Pose(backbone="dinov3_vit_small", num_keypoints=4,
                   num_classes=2, neck_channels=(32, 64, 128),
                   dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=True)
    outs, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert [o.shape[1] for o in outs] == [8, 4, 2]  # strides 8/16/32
    dec = m.apply(v, x, train=False)
    assert dec.shape == (1, 64 + 16 + 4, 2 + 12)


def test_deeppose_forward():
    from tpupose.models.deeppose import DeepPose

    m = DeepPose(backbone="resnet18", num_keypoints=17, dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (2, 17, 2)
