"""Heatmap knowledge distillation (train.distill_*, FPD CVPR 2019).

Contract: with a teacher configured, the compiled train step runs the
frozen teacher's eval forward on the same (augmented) pixels and mixes
MSE(student_hm, teacher_hm) into the loss; pure-KD training (w=1) pulls
the student toward the teacher with no ground-truth signal at all.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpupose.configs.default import default_config
from tpupose.engine.train_state import (create_train_state,
                                        make_heatmap_train_step)
from tpupose.models.simple_baseline import SimpleBaseline

# full-model compiles: slow tier (tests/README.md)
pytestmark = pytest.mark.slow


def _mk_state(lr=1e-3, seed=0):
    # 32x32 input -> C5 1x1 -> three deconvs -> 8x8 heatmaps
    model = SimpleBaseline(backbone="resnet18", num_keypoints=4,
                           deconv_channels=(16, 16, 16), dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(seed),
                               jnp.zeros((1, 32, 32, 3), jnp.float32),
                               optax.adam(lr))
    return model, state


def test_pure_kd_converges_to_teacher():
    model, state = _mk_state(lr=3e-3, seed=0)
    _, tstate = _mk_state(seed=1)   # different init = the teacher
    tvars = {"params": tstate.params, "batch_stats": tstate.batch_stats}

    def loss_fn(pred, target, tw=None):
        from tpupose.losses.heatmap import joints_mse_loss

        return joints_mse_loss(pred, target, tw)

    step = make_heatmap_train_step(loss_fn, heatmap_size=(8, 8),
                                   teacher_apply=model.apply,
                                   distill_weight=1.0)
    rs = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rs.randint(0, 255, (8, 32, 32, 3)), jnp.uint8),
        "joints": jnp.asarray(rs.uniform(0, 8, (8, 4, 2)), jnp.float32),
        "visibility": jnp.ones((8, 4), jnp.float32),
    }
    kd0 = None
    for i in range(40):
        state, metrics = step(state, batch, tvars)
        if kd0 is None:
            kd0 = float(metrics["kd_loss"])
    kdN = float(metrics["kd_loss"])
    assert np.isfinite(kd0) and np.isfinite(kdN)
    assert kdN < 0.5 * kd0, f"KD did not pull toward teacher: {kd0} -> {kdN}"
    # with w=1 the total loss IS the KD term
    np.testing.assert_allclose(float(metrics["loss"]), kdN, rtol=1e-5)
    assert "task_loss" in metrics


def _write_teacher_yaml(path, heatmap=(16, 16), kpts=4, image=(64, 64)):
    with open(path, "w") as f:
        f.write(
            "model:\n"
            "  name: simple_baseline\n"
            "  backbone: resnet18\n"
            f"  num_keypoints: {kpts}\n"
            f"  heatmap_size: [{heatmap[0]}, {heatmap[1]}]\n"
            "  deconv_channels: [16, 16, 16]\n"
            "data:\n"
            f"  image_size: [{image[0]}, {image[1]}]\n")
    return path


@pytest.fixture
def student_cfg(tmp_path):
    cfg = default_config()
    cfg.model.name = "simple_baseline"
    cfg.model.backbone = "resnet18"
    cfg.model.num_keypoints = 4
    cfg.model.heatmap_size = (16, 16)
    cfg.model.deconv_channels = (16, 16, 16)
    cfg.data.name = "synthetic"
    cfg.data.image_size = (64, 64)
    cfg.train.batch_size = 8
    cfg.train.epochs = 1
    cfg.train.warmup_epochs = 0
    cfg.train.mixed_precision = False
    cfg.train.output_dir = str(tmp_path / "out")
    return cfg


def test_trainer_wires_distillation(student_cfg, tmp_path):
    from tpupose.engine.trainer import Trainer

    student_cfg.train.distill_cfg = _write_teacher_yaml(
        str(tmp_path / "teacher.yaml"))
    tr = Trainer(student_cfg)
    batch = next(iter(tr.train_loader))
    db = tr._prepare_batch(batch)
    state, metrics = tr.train_step(tr.state, db)
    assert "kd_loss" in metrics and "task_loss" in metrics
    kd, task, total = (float(metrics["kd_loss"]),
                       float(metrics["task_loss"]), float(metrics["loss"]))
    assert np.isfinite(kd) and kd > 0
    np.testing.assert_allclose(total, 0.5 * task + 0.5 * kd, rtol=1e-5)


def test_trainer_rejects_mismatched_teacher(student_cfg, tmp_path):
    from tpupose.engine.trainer import Trainer

    student_cfg.train.distill_cfg = _write_teacher_yaml(
        str(tmp_path / "teacher_bad.yaml"), heatmap=(8, 8))
    with pytest.raises(ValueError, match="heatmap grid"):
        Trainer(student_cfg)


def test_trainer_rejects_non_heatmap_teacher(student_cfg, tmp_path):
    """A simcc/deeppose/yolo teacher returns tuples/coords — reject it
    with a clear error before joints_mse_loss trips on it at trace time
    (round-2 ADVICE #2)."""
    from tpupose.engine.trainer import Trainer

    path = str(tmp_path / "teacher_simcc.yaml")
    with open(path, "w") as f:
        f.write(
            "model:\n"
            "  name: simcc\n"
            "  backbone: resnet18\n"
            "  num_keypoints: 4\n"
            "  heatmap_size: [16, 16]\n"
            "data:\n"
            "  image_size: [64, 64]\n")
    student_cfg.train.distill_cfg = path
    with pytest.raises(ValueError, match="heatmap-family"):
        Trainer(student_cfg)
