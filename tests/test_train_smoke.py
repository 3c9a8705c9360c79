"""Integration smoke (SURVEY.md §4(d)): tiny synthetic dataset -> a few
train steps -> loss decreases -> checkpoint round-trip; DP over the
8-device virtual CPU mesh."""

import numpy as np
import pytest

from tpupose.configs.default import default_config

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    cfg = default_config()
    cfg.model.name = "simple_baseline"
    cfg.model.backbone = "resnet18"
    cfg.model.num_keypoints = 4
    cfg.model.heatmap_size = (16, 16)
    cfg.data.name = "synthetic"
    cfg.data.image_size = (64, 64)
    cfg.train.batch_size = 8
    cfg.train.epochs = 2
    cfg.train.warmup_epochs = 0
    cfg.train.mixed_precision = False
    cfg.train.log_interval = 100
    cfg.train.output_dir = str(tmp_path_factory.mktemp("out"))
    cfg.optimizer.lr = 1e-3
    cfg.optimizer.name = "adamw"
    cfg.model.freeze_backbone = False
    return cfg


def test_train_two_epochs_loss_decreases_and_ckpt_roundtrip(tiny_cfg):
    from tpupose.engine.trainer import Trainer

    tr = Trainer(tiny_cfg)
    assert tr.mesh_mgr.data_size == 8  # batch really sharded over 8 devices
    l0 = tr.iter_one_epoch(0)
    l1 = tr.iter_one_epoch(1)
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0, f"loss did not decrease: {l0} -> {l1}"

    # checkpoint round-trip
    tr.save_checkpoint(metric=l1)
    step_before = int(tr.state.step)
    p0 = tr.state.params
    tr2 = Trainer(tiny_cfg)
    tr2.load_checkpoint()
    assert int(tr2.state.step) == step_before
    a = np.asarray(
        next(iter(jax_leaves(p0)))
    )
    b = np.asarray(next(iter(jax_leaves(tr2.state.params))))
    np.testing.assert_allclose(a, b)


def jax_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def test_validate_runs(tiny_cfg):
    from tpupose.engine.trainer import Trainer

    tr = Trainer(tiny_cfg)
    v = tr.validate()
    assert np.isfinite(v)


@pytest.mark.slow
def test_training_localizes_keypoints():
    """Beyond loss-goes-down: the heatmap family actually LEARNS
    localization. Overfit 16 synthetic samples (unambiguous channels,
    K=3) and assert decoded argmax coords land within 2 heatmap px of GT
    for >90% of visible joints. MSE-on-sparse-Gaussians sits at the
    predict-zero plateau (~0.006) for the first few hundred steps before
    latching onto the blobs — a loss-only smoke test cannot see the
    difference, this test can."""
    import jax
    import jax.numpy as jnp
    import optax

    from tpupose.data.synthetic import SyntheticTopDownDataset
    from tpupose.engine.train_state import (create_train_state,
                                            make_heatmap_train_step)
    from tpupose.losses.heatmap import joints_mse_loss
    from tpupose.models.simple_baseline import SimpleBaseline
    from tpupose.ops.decode import decode_heatmaps
    from tpupose.ops.preprocess import normalize_images

    ds = SyntheticTopDownDataset(8, (64, 64), (16, 16), 3, seed=0)
    samples = [ds[i] for i in range(8)]
    imgs = np.stack([s["image"] for s in samples])
    joints = np.stack([s["joints"] for s in samples])
    vis = np.stack([s["visibility"] for s in samples])

    model = SimpleBaseline(backbone="resnet18", num_keypoints=3,
                           deconv_channels=(64, 64, 64),
                           dtype=jnp.float32)
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(3e-3))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), tx)
    step = make_heatmap_train_step(joints_mse_loss, heatmap_size=(16, 16))
    batch = {"images": jnp.asarray(imgs), "joints": jnp.asarray(joints),
             "visibility": jnp.asarray(vis)}
    for _ in range(300):
        state, metrics = step(state, batch)
    assert float(metrics["loss"]) < 1e-3

    hm = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        normalize_images(jnp.asarray(imgs)), train=False)
    coords, _ = decode_heatmaps(jnp.transpose(hm, (0, 3, 1, 2)),
                                method="argmax")
    err = np.abs(np.asarray(coords) - joints).max(axis=-1)[vis > 0]
    assert (err < 2.0).mean() > 0.9, (err.mean(), (err < 2.0).mean())
