"""Data-parallel correctness: a train step with the batch sharded over 8
devices must produce the same loss and parameter update as the same step
on one device — XLA's inserted gradient all-reduce IS the DDP all-reduce,
and BatchNorm statistics are global-batch (sync-BN) in both cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from tpupose.engine.train_state import create_train_state, make_heatmap_train_step
from tpupose.losses.heatmap import joints_mse_loss
from tpupose.models.simple_baseline import SimpleBaseline
from tpupose.parallel.mesh import create_mesh

pytestmark = pytest.mark.slow


def _setup():
    model = SimpleBaseline(backbone="resnet18", num_keypoints=4,
                           deconv_channels=(32, 32, 32), dtype=jnp.float32)
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.sgd(1e-2))
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 32, 32, 3), jnp.float32)
    state = create_train_state(model, rng, sample, tx)
    step = make_heatmap_train_step(
        lambda p, t, w=None: joints_mse_loss(p, t, w))
    rngd = np.random.RandomState(0)
    batch = {
        "images": rngd.randint(0, 255, (8, 32, 32, 3)).astype(np.uint8),
        "target": rngd.rand(8, 8, 8, 4).astype(np.float32),
        "target_weight": np.ones((8, 4), np.float32),
    }
    return state, step, batch


def test_sharded_step_matches_single_device():
    mesh = create_mesh(data=8, model=1)
    state, step, batch = _setup()

    # single device
    b1 = jax.tree_util.tree_map(jnp.asarray, batch)
    s1, m1 = step(state, b1)

    # 8-way batch sharding, replicated params
    state2, step2, _ = _setup()
    repl = NamedSharding(mesh, P())
    state2 = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl) if hasattr(x, "shape") else x, state2)
    b2 = {k: jax.device_put(
        np.asarray(v),
        NamedSharding(mesh, P("data", *([None] * (np.asarray(v).ndim - 1)))))
        for k, v in batch.items()}
    s2, m2 = step2(state2, b2)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]),
                               rtol=1e-4)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
    # batch_stats (sync-BN) also identical
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(s2.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
