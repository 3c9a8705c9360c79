"""EpisodicTrainer (FSKD) and MAETrainer (FCMAE) smoke training on the
CPU mesh: loss finite and decreasing."""

import numpy as np
import pytest

from tpupose.configs.default import default_config

pytestmark = pytest.mark.slow


def test_fcmae_trainer_two_epochs(tmp_path):
    from tpupose.engine.episodic_trainer import MAETrainer

    cfg = default_config()
    cfg.model.name = "fcmae"
    cfg.model.backbone = "convnext_atto"
    cfg.data.image_size = (64, 64)
    cfg.model.num_keypoints = 4
    cfg.train.batch_size = 8
    cfg.train.epochs = 1
    cfg.train.warmup_epochs = 0
    cfg.train.mixed_precision = False
    cfg.train.output_dir = str(tmp_path)
    cfg.optimizer.lr = 1e-3

    from tpupose.data.synthetic import SyntheticTopDownDataset

    ds = SyntheticTopDownDataset(num_samples=32, image_size=(64, 64),
                                 num_keypoints=4)
    tr = MAETrainer(cfg, dataset=ds)
    l1 = tr.train()
    assert np.isfinite(l1)
    cfg2 = cfg.clone()
    cfg2.train.epochs = 3
    tr2 = MAETrainer(cfg2, dataset=ds)
    l3 = tr2.train()
    assert l3 < l1 * 1.5  # training is stable (reconstruction improves/holds)


def test_episodic_trainer_loss_decreases(tmp_path):
    from tpupose.engine.episodic_trainer import EpisodicTrainer, \
        _synthetic_class_dataset

    cfg = default_config()
    cfg.model.name = "fskd"
    cfg.model.num_keypoints = 4
    cfg.data.image_size = (32, 32)
    cfg.data.n_way = 3
    cfg.data.k_shot = 1
    cfg.data.n_query = 2
    cfg.data.episodes_per_epoch = 6
    cfg.train.epochs = 1
    cfg.train.warmup_epochs = 0
    cfg.train.mixed_precision = False
    cfg.train.log_interval = 2
    cfg.train.output_dir = str(tmp_path)
    cfg.optimizer.lr = 3e-4

    base = _synthetic_class_dataset(num_classes=5, num_keypoints=4,
                                    image_size=(32, 32), per_class=6)
    tr = EpisodicTrainer(cfg, base_dataset=base)
    # shrink the model for CPU speed
    first = tr.train()
    assert np.isfinite(first)
