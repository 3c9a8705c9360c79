"""Episodic (FSKD) and masked-autoencoder (FCMAE) training loops.

Capability parity with the reference's episodic config surface
(HPE/configs/default.py:21-53 n_way/k_shot/episodes; fskd_small.yaml) and
the FCMAE pretraining capability (HPE/models/backbones/fcmae.py). The
reference never ships a working trainer for either (SURVEY.md §3.5
"skeletal"); these are complete.

Both reuse the Orbax CheckpointManager and the mesh; episodes are small,
so they run replicated (DP over the episode batch would shard the leading
axis the same way as the main Trainer).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpupose.configs.default import Config
from tpupose.engine.checkpoint import CheckpointManager
from tpupose.engine.optimizers import make_optimizer
from tpupose.engine.schedulers import make_schedule
from tpupose.engine.train_state import TrainState
from tpupose.utils.logging import printM, printS, printT
from tpupose.utils.meters import MetricDict
from tpupose.utils.seed import set_seed


class EpisodicTrainer:
    """N-way/K-shot episodic training for FSKD."""

    def __init__(self, cfg: Config, base_dataset=None):
        from tpupose.data.episodic import FewShotDataset
        from tpupose.models.fskd import FSKD, fskd_episode_loss

        self.cfg = cfg
        self.rng = set_seed(cfg.train.seed)
        d = cfg.data
        if base_dataset is None:
            base_dataset = _synthetic_class_dataset(
                num_classes=max(d.n_way + 2, 6),
                num_keypoints=cfg.model.num_keypoints,
                image_size=tuple(d.image_size))
        self.episodes = FewShotDataset(
            base_dataset, n_way=d.n_way, k_shot=d.k_shot, n_query=d.n_query,
            episodes_per_epoch=d.episodes_per_epoch, seed=cfg.train.seed)

        dtype = jnp.bfloat16 if cfg.train.mixed_precision else jnp.float32
        vit_size = cfg.model.backbone.replace("vit_", "") \
            if cfg.model.backbone.startswith("vit") else "small"
        self.model = FSKD(n_way=d.n_way,
                          num_keypoints=cfg.model.num_keypoints,
                          dim=256, vit_size=vit_size, dtype=dtype)
        ep = self.episodes[0]
        self.rng, init_rng = jax.random.split(self.rng)
        variables = self.model.init(
            init_rng, jnp.asarray(ep["support_images"]),
            jnp.asarray(ep["support_labels"]),
            jnp.asarray(ep["query_images"]), train=False)
        steps = cfg.train.epochs * d.episodes_per_epoch
        sched = make_schedule(cfg.lr_scheduler, cfg.optimizer.lr, steps,
                              cfg.train.warmup_epochs * d.episodes_per_epoch)
        tx = make_optimizer(cfg.optimizer, schedule=sched,
                            grad_clip_norm=cfg.train.grad_clip_norm)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            apply_fn=self.model.apply, tx=tx)
        self._loss = fskd_episode_loss
        self.ckpt = CheckpointManager(
            os.path.join(cfg.train.output_dir, cfg.train.experiment, "ckpt"),
            interval=cfg.train.ckpt_interval)
        self._step = jax.jit(self._train_step, donate_argnums=(0,))

    def _train_step(self, state, ep):
        def loss_fn(params):
            out = state.apply_fn(
                {"params": params}, ep["support_images"],
                ep["support_labels"], ep["query_images"], train=True)
            total, parts = self._loss(out, ep["query_labels"],
                                      ep["query_keypoints"],
                                      ep["query_visibility"])
            return total, parts

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads)
        return state, {"loss": loss, **{f"loss_{k}": v for k, v in parts.items()}}

    @staticmethod
    def _to_device(ep):
        keep = ("support_images", "support_labels", "query_images",
                "query_labels", "query_keypoints", "query_visibility")
        out = {k: jnp.asarray(ep[k]) for k in keep}
        out["support_images"] = out["support_images"].astype(jnp.float32) / 255.0
        out["query_images"] = out["query_images"].astype(jnp.float32) / 255.0
        return out

    def train(self):
        meters = MetricDict()
        for epoch in range(self.cfg.train.epochs):
            meters.reset()
            t0 = time.perf_counter()
            for i in range(len(self.episodes)):
                ep = self._to_device(self.episodes[i])
                self.state, m = self._step(self.state, ep)
                if (i + 1) % self.cfg.train.log_interval == 0:
                    meters.update(jax.device_get(m))
            meters.update(jax.device_get(m))
            printM(f"episodic epoch {epoch}: {meters.format()} "
                   f"({len(self.episodes) / (time.perf_counter() - t0):.1f} ep/s)")
            self.ckpt.save(int(self.state.step), self.state,
                           metric=meters["loss"].avg)
        printS("episodic training complete")
        return meters["loss"].avg


class MAETrainer:
    """FCMAE masked-autoencoder pretraining loop."""

    def __init__(self, cfg: Config, dataset=None):
        from tpupose.data.loader import BatchLoader
        from tpupose.models.fcmae import FCMAE

        self.cfg = cfg
        self.rng = set_seed(cfg.train.seed)
        if dataset is None:
            from tpupose.data.synthetic import SyntheticTopDownDataset

            dataset = SyntheticTopDownDataset(
                num_samples=256, image_size=tuple(cfg.data.image_size),
                num_keypoints=cfg.model.num_keypoints)
        self.loader = BatchLoader(dataset, cfg.train.batch_size, seed=cfg.train.seed)

        dtype = jnp.bfloat16 if cfg.train.mixed_precision else jnp.float32
        size = cfg.model.backbone.replace("convnext_", "") \
            if "convnext" in cfg.model.backbone else "atto"
        self.model = FCMAE(size=size, dtype=dtype)
        H, W = cfg.data.image_size
        self.rng, init_rng, mask_rng = jax.random.split(self.rng, 3)
        variables = self.model.init(
            {"params": init_rng, "mask": mask_rng},
            jnp.zeros((1, H, W, 3), jnp.float32), train=False)
        steps = cfg.train.epochs * max(len(self.loader), 1)
        sched = make_schedule(cfg.lr_scheduler, cfg.optimizer.lr, steps,
                              cfg.train.warmup_epochs * max(len(self.loader), 1))
        tx = make_optimizer(cfg.optimizer, schedule=sched,
                            grad_clip_norm=cfg.train.grad_clip_norm)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            batch_stats={}, opt_state=tx.init(variables["params"]),
            apply_fn=self.model.apply, tx=tx)
        self.ckpt = CheckpointManager(
            os.path.join(cfg.train.output_dir, cfg.train.experiment, "ckpt"),
            interval=cfg.train.ckpt_interval)
        self._step = jax.jit(self._train_step, donate_argnums=(0,))

    def _train_step(self, state, images, rng):
        def loss_fn(params):
            loss, _ = state.apply_fn(
                {"params": params}, images, train=True, rngs={"mask": rng})
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads)
        return state, loss

    def train(self):
        last = float("inf")
        for epoch in range(self.cfg.train.epochs):
            total, n = 0.0, 0
            for batch in self.loader:
                self.rng, r = jax.random.split(self.rng)
                imgs = jnp.asarray(batch["images"]).astype(jnp.float32) / 255.0
                self.state, loss = self._step(self.state, imgs, r)
                total += float(loss)
                n += 1
            last = total / max(n, 1)
            printM(f"fcmae epoch {epoch}: loss={last:.5f}")
            self.ckpt.save(int(self.state.step), self.state, metric=last)
        printS("fcmae pretraining complete")
        return last


def _synthetic_class_dataset(num_classes: int, num_keypoints: int,
                             image_size=(32, 32), per_class: int = 12,
                             seed: int = 0):
    """Tiny labeled base dataset for episodic smoke training: per-class
    intensity signature + keypoints."""
    rng = np.random.RandomState(seed)
    H, W = image_size

    class _DS:
        def __init__(self):
            self.samples = []
            for c in range(num_classes):
                for _ in range(per_class):
                    img = np.full((H, W, 3),
                                  int(255 * (c + 1) / (num_classes + 1)),
                                  np.uint8)
                    img = np.clip(img + rng.randint(-10, 10, img.shape),
                                  0, 255).astype(np.uint8)
                    kp = rng.uniform(0.2, 0.8, (num_keypoints, 3)).astype(np.float32)
                    kp[:, 2] = 2.0
                    self.samples.append({"class_id": c, "image": img,
                                         "keypoints": kp})

        def __len__(self):
            return len(self.samples)

        def __getitem__(self, i):
            return self.samples[i]

    return _DS()
