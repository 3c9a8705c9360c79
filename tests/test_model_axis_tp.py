"""Tensor-parallel 'model' axis correctness (VERDICT r1 item #7): a train
step with wide kernels sharded over mesh.model=2 must produce the same
loss and parameter update as the DP-only (model=1) layout — GSPMD inserts
the collectives, the math is identical."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpupose.engine.train_state import create_train_state, make_heatmap_train_step
from tpupose.losses.heatmap import joints_mse_loss
from tpupose.models.simple_baseline import SimpleBaseline
from tpupose.parallel.mesh import MeshManager


def _run(model_axis: int):
    mgr = MeshManager(data=-1, model=model_axis)
    net = SimpleBaseline(backbone="resnet18", num_keypoints=4,
                         deconv_channels=(64, 64, 64), dtype=jnp.float32)
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (8, 64, 64, 3)).astype(np.uint8)
    joints = rng.uniform(2, 12, (8, 4, 2)).astype(np.float32)
    vis = np.ones((8, 4), np.float32)

    state = create_train_state(net, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)),
                               optax.adamw(1e-3))
    state = mgr.shard_state(state)
    if model_axis > 1:
        # the layout really is sharded: at least one kernel lives on 'model'
        shardings = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda x: str(x.sharding.spec), state.params))
        assert any("model" in s for s in shardings), shardings

    step = make_heatmap_train_step(joints_mse_loss, heatmap_size=(16, 16))
    batch = mgr.shard_batch({"images": imgs, "joints": joints,
                             "visibility": vis})
    state, metrics = step(state, batch)
    loss = float(metrics["loss"])
    # pull one updated kernel back to host for comparison
    k = np.asarray(state.params["HeatmapHead_0"]["Conv_0"]["kernel"])
    return loss, k


@pytest.mark.slow
def test_model_axis_matches_dp_only():
    loss_dp, k_dp = _run(1)
    loss_tp, k_tp = _run(2)
    assert np.isfinite(loss_dp) and np.isfinite(loss_tp)
    np.testing.assert_allclose(loss_tp, loss_dp, rtol=1e-5)
    np.testing.assert_allclose(k_tp, k_dp, rtol=1e-4, atol=1e-6)
