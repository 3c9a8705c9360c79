import jax
import jax.numpy as jnp

from tpupose.models.backbones.hrnet import HRNet, HRNetPose

import pytest

# full-model compiles: slow tier (tests/README.md)
pytestmark = pytest.mark.slow


def test_hrnet_stride4_output():
    m = HRNet(width=8, modules=(1, 1, 1), dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 16, 16, 8)


def test_hrnet_pose_heatmap_shape_and_train():
    # tiny variant via direct module to keep CPU compile fast
    import flax.linen as nn

    class TinyHRNetPose(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            f = HRNet(width=8, modules=(1, 1, 1), dtype=jnp.float32)(x, train=train)
            return nn.Conv(5, (1, 1), dtype=jnp.float32)(f)

    m = TinyHRNetPose()
    x = jnp.ones((2, 64, 48, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out, mut = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 16, 12, 5)
    assert "batch_stats" in mut
