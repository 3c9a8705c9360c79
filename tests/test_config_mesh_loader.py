"""Config system, mesh helpers, and batch loader unit tests."""

import numpy as np
import pytest

from tpupose.configs.default import default_config
from tpupose.configs.parser import parse_args, update_config


def test_config_merge_and_freeze():
    cfg = default_config()
    cfg.merge_dict({"train": {"batch_size": 32}, "model": {"name": "hrnet"}})
    assert cfg.train.batch_size == 32
    assert cfg.model.name == "hrnet"
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.train = None
    with pytest.raises(AttributeError):
        cfg.merge_dict({"train": {"epochs": 1}})


def test_config_unknown_key_rejected():
    cfg = default_config()
    with pytest.raises(KeyError):
        cfg.merge_dict({"train": {"batch_sizee": 1}})


def test_config_dotted_overrides_and_coercion():
    cfg = default_config()
    cfg.merge_dotted({
        "train.batch_size": "32",
        "data.image_size": "[128, 96]",
        "train.mixed_precision": "false",
        "optimizer.lr": "1e-4",
    })
    assert cfg.train.batch_size == 32
    assert cfg.data.image_size == (128, 96)
    assert cfg.train.mixed_precision is False
    assert cfg.optimizer.lr == pytest.approx(1e-4)


def test_parse_args_and_update(tmp_path):
    y = tmp_path / "exp.yaml"
    y.write_text("train:\n  epochs: 7\nmodel:\n  name: deeppose\n")
    args = parse_args(["--cfg", str(y), "--ckpt", "/x", "train.seed=5"])
    cfg = update_config(default_config(), args)
    assert cfg.train.epochs == 7
    assert cfg.model.name == "deeppose"
    assert cfg.model.checkpoint == "/x"
    assert cfg.train.seed == 5
    assert cfg._frozen


def test_mesh_shapes_and_batch_sharding(mesh8):
    import jax

    from tpupose.parallel.mesh import shard_batch

    assert mesh8.shape["data"] == 8
    batch = {"x": np.arange(16 * 3, dtype=np.float32).reshape(16, 3)}
    out = shard_batch(mesh8, batch)
    assert out["x"].shape == (16, 3)
    # sharded over the data axis
    assert len(out["x"].sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out["x"]), batch["x"])
    del jax


def test_batch_loader_shapes_and_determinism():
    from tpupose.data.loader import BatchLoader
    from tpupose.data.synthetic import SyntheticTopDownDataset

    ds = SyntheticTopDownDataset(num_samples=20, image_size=(32, 32),
                                 heatmap_size=(8, 8), num_keypoints=3)
    dl = BatchLoader(ds, batch_size=8, shuffle=True, seed=7)
    batches = list(dl)
    assert len(batches) == 2  # drop_last
    assert batches[0]["images"].shape == (8, 32, 32, 3)
    assert batches[0]["joints"].shape == (8, 3, 2)
    # threaded loader yields the same content set
    dl2 = BatchLoader(ds, batch_size=8, shuffle=False, num_workers=2)
    a = np.concatenate([b["images"] for b in dl2])
    dl3 = BatchLoader(ds, batch_size=8, shuffle=False)
    b = np.concatenate([bb["images"] for bb in dl3])
    np.testing.assert_array_equal(a, b)


def test_optimizer_registry_and_schedules():
    import jax.numpy as jnp

    from tpupose.configs.default import OptimizerConfig, SchedulerConfig
    from tpupose.engine.optimizers import OPTIMIZERS, make_optimizer
    from tpupose.engine.schedulers import SCHEDULERS, make_schedule

    assert len(OPTIMIZERS) >= 13  # reference registry size
    assert len(SCHEDULERS) >= 7
    ocfg = OptimizerConfig(name="adamw", lr=1e-3)
    scfg = SchedulerConfig(name="cosine")
    sched = make_schedule(scfg, 1e-3, total_steps=100, warmup_steps=10)
    assert float(sched(0)) == 0.0
    assert float(sched(10)) == pytest.approx(1e-3, rel=1e-5)
    assert float(sched(99)) < 1e-3
    tx = make_optimizer(ocfg, schedule=sched, grad_clip_norm=1.0)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    upd, _ = tx.update({"w": jnp.full(3, 100.0)}, state, params)
    assert np.isfinite(np.asarray(upd["w"])).all()


def test_frozen_backbone_gets_zero_updates():
    import jax.numpy as jnp

    from tpupose.configs.default import OptimizerConfig
    from tpupose.engine.optimizers import make_optimizer

    params = {"ResNet_0": {"k": jnp.ones(2)}, "head": {"k": jnp.ones(2)}}
    tx = make_optimizer(
        OptimizerConfig(name="sgd", lr=1.0), params=params,
        is_frozen=lambda p: p[0].startswith("ResNet"))
    state = tx.init(params)
    grads = {"ResNet_0": {"k": jnp.ones(2)}, "head": {"k": jnp.ones(2)}}
    upd, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(upd["ResNet_0"]["k"]), 0.0)
    assert float(np.abs(np.asarray(upd["head"]["k"])).sum()) > 0


def test_batchloader_workers_preserve_order_and_pad_last():
    """num_workers>0 collates batches in parallel but yields them in
    epoch order; pad_last fills the tail batch to the static size with a
    pad_mask marking real rows."""
    import numpy as np

    from tpupose.data.loader import BatchLoader

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.int32)}

    ld = BatchLoader(DS(), batch_size=4, shuffle=False, drop_last=False,
                     num_workers=3, pad_last=True)
    batches = list(ld)
    assert len(batches) == 3
    got = np.concatenate([b["x"][:, 0][b["pad_mask"]] for b in batches])
    np.testing.assert_array_equal(got, np.arange(10))
    # every batch is the full static size
    assert all(b["x"].shape == (4, 2) for b in batches)
    assert batches[-1]["pad_mask"].tolist() == [True, True, False, False]


def test_schedule_units_respect_grad_accum():
    """optax.MultiSteps advances the schedule once per ACCUMULATED update,
    so Builder must size warmup/decay in update units, not micro-steps."""
    from tpupose.configs.default import default_config
    from tpupose.engine.builder import Builder

    cfg = default_config()
    cfg.train.epochs = 10
    cfg.train.warmup_epochs = 0
    cfg.train.grad_accum_steps = 4
    cfg.lr_scheduler.name = "cosine"
    base, _ = Builder(cfg).lr_scheduler(steps_per_epoch=100)
    peak = float(base(0))
    # 10 epochs * (100 // 4) updates = 250 total: the cosine must be at
    # its floor by update 250, not stretched out to 1000
    assert float(base(250)) <= 0.02 * peak
    assert float(base(125)) < 0.85 * peak  # mid-run decay has progressed


def test_freeze_backbone_defaults_off():
    """freeze_backbone must default False: a True default silently froze
    every non-DINOv3 family's backbone at init (dinov3 yamls opt in)."""
    from tpupose.configs.default import default_config

    assert default_config().model.freeze_backbone is False
