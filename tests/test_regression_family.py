"""DeepPose regression training family: loss correctness + trainer smoke."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpupose.configs.default import default_config
from tpupose.losses.heatmap import coord_mse_loss


def test_coord_mse_hand_computed():
    pred = jnp.zeros((1, 2, 2))
    target = jnp.asarray([[[0.3, 0.4], [1.0, 1.0]]])
    vis = jnp.asarray([[1.0, 0.0]])
    # only joint 0 counts: 0.3^2 + 0.4^2 = 0.25
    np.testing.assert_allclose(float(coord_mse_loss(pred, target, vis)),
                               0.25, atol=1e-6)
    # unmasked: mean of (0.25, 2.0)
    np.testing.assert_allclose(float(coord_mse_loss(pred, target)),
                               1.125, atol=1e-6)


@pytest.mark.slow
def test_deeppose_trainer_loss_decreases(tmp_path):
    from tpupose.engine.trainer import Trainer

    cfg = default_config()
    cfg.model.name = "deeppose"
    cfg.model.backbone = "resnet18"
    cfg.model.num_keypoints = 4
    cfg.model.heatmap_size = (16, 16)   # joint-normalization frame
    cfg.model.freeze_backbone = False
    cfg.data.name = "synthetic"
    cfg.data.image_size = (64, 64)
    cfg.train.batch_size = 16
    cfg.train.warmup_epochs = 0
    cfg.train.mixed_precision = False
    cfg.train.log_interval = 100
    cfg.train.output_dir = str(tmp_path)
    cfg.loss.name = "coord_mse"
    cfg.optimizer.name = "adam"
    cfg.optimizer.lr = 1e-3

    tr = Trainer(cfg)
    assert tr.family == "regression"
    l0 = tr.iter_one_epoch(0)
    l1 = tr.iter_one_epoch(1)
    assert np.isfinite(l1) and l1 < l0
    v = tr.validate()
    assert np.isfinite(v)
