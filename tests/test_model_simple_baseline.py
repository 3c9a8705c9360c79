import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpupose.models.simple_baseline import SimpleBaseline
from tpupose.models.backbones.resnet import ResNet

# full-model compiles: slow tier (tests/README.md)
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("name", ["resnet18", "resnet50"])
def test_resnet_stage_shapes(name):
    m = ResNet.from_name(name, dtype=jnp.float32, return_stages=True)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    feats = m.apply(vars_, x, train=False)
    assert [f.shape[1] for f in feats] == [16, 8, 4, 2]
    mult = 1 if name == "resnet18" else 4
    assert [f.shape[-1] for f in feats] == [64 * mult, 128 * mult, 256 * mult, 512 * mult]


def test_simple_baseline_output_shape():
    m = SimpleBaseline(backbone="resnet18", num_keypoints=17, dtype=jnp.float32)
    x = jnp.zeros((2, 256, 192, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(vars_, x, train=False)
    assert out.shape == (2, 64, 48, 17)
    assert out.dtype == jnp.float32


def test_simple_baseline_train_mode_updates_batch_stats():
    m = SimpleBaseline(backbone="resnet18", num_keypoints=4, dtype=jnp.float32)
    x = jnp.ones((2, 64, 48, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    out, mut = m.apply(vars_, x, train=True, mutable=["batch_stats"])
    old = jax.tree_util.tree_leaves(vars_["batch_stats"])
    new = jax.tree_util.tree_leaves(mut["batch_stats"])
    changed = any(not np.allclose(a, b) for a, b in zip(old, new))
    assert changed
