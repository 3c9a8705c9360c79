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
