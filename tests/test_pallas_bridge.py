"""block2_0 bridge kernel (ops/pallas_bridge.py) vs the flax Bottleneck
oracle, and the full three-kernel composed forward. CPU interpreter."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpupose.models.simple_baseline import SimpleBaseline
from tpupose.ops.pallas_bridge import (bridge_pallas, bridge_reference,
                                       fold_bridge_weights)


@pytest.fixture(scope="module")
def r50():
    model = SimpleBaseline(backbone="resnet50", num_keypoints=17,
                           dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 256, 192, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    rs = np.random.RandomState(1)
    for ci in range(4):
        bn = variables["batch_stats"]["ResNet_0"]["Bottleneck_3"][
            f"BatchNorm_{ci}"]
        bn["mean"] = jnp.asarray(rs.normal(0, 0.3, bn["mean"].shape),
                                 jnp.float32)
        bn["var"] = jnp.asarray(rs.uniform(0.5, 2.0, bn["var"].shape),
                                jnp.float32)
    return model, variables


def test_bridge_matches_flax_block(r50):
    _, variables = r50
    rs = np.random.RandomState(2)
    # layer1-output-like input: non-negative (post-relu), 256 ch
    x = jnp.asarray(rs.uniform(0, 2, (2, 64, 48, 256)), jnp.bfloat16)
    ref = np.asarray(bridge_reference(variables, x), np.float32)
    w = fold_bridge_weights(variables)
    got = np.asarray(bridge_pallas(x, w, interpret=True), np.float32)
    assert got.shape == (2, 32, 24, 512)
    denom = max(np.abs(ref).max(), 1e-6)
    assert np.abs(got - ref).max() / denom < 0.05
    assert np.abs(got - ref).mean() / denom < 5e-3


def test_full_model_three_kernels(r50):
    from tpupose.ops.pallas_stem import fast_r50_stem_apply

    model, variables = r50
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.uniform(-2, 2, (2, 256, 192, 3)), jnp.bfloat16)
    ref = np.asarray(model.apply(variables, x, train=False), np.float32)
    got = np.asarray(
        fast_r50_stem_apply(model.apply, variables, None, x, bridge=True,
                            train=False), np.float32)
    assert got.shape == ref.shape
    denom = max(np.abs(ref).max(), 1e-6)
    assert np.abs(got - ref).max() / denom < 0.06
    assert np.abs(got - ref).mean() / denom < 5e-3
