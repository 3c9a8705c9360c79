"""Builder: name-based factories wiring config -> objects.

Capability parity with the reference Builder
(reference: pose/pose/core/builder.py:8-144: .model()/.loss()/.optimizer()
/.lr_scheduler()/.dataset()/.set_device(); legacy HPE/core/builder.py:7-42).
`set_device` — the DDP-wrap + DistributedSampler step — becomes MeshManager
construction: there is no model wrapping in JAX, only shardings.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpupose.configs.default import Config
from tpupose.engine.optimizers import make_optimizer
from tpupose.engine.schedulers import make_schedule
from tpupose.models import get_model
from tpupose.parallel.mesh import MeshManager
from tpupose.utils.logging import printT


_BACKBONE_PREFIXES = ("ResNet", "ConvNeXt", "ViT", "HRNet", "backbone",
                      "Dinov3", "DinoViT")


def is_backbone_path(path: tuple) -> bool:
    """Param-path predicate for the two-group lr split / freezing
    (the cv3/cv4-name split analog, HPE/train.py:39-55)."""
    return bool(path) and any(str(path[0]).startswith(p) for p in _BACKBONE_PREFIXES)


class Builder:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self._mesh_mgr = None

    # -- device / mesh (the set_device analog) ------------------------------
    def set_device(self) -> MeshManager:
        if self._mesh_mgr is None:
            self._mesh_mgr = MeshManager(data=self.cfg.mesh.data,
                                         model=self.cfg.mesh.model)
        return self._mesh_mgr

    # -- model ---------------------------------------------------------------
    def model(self):
        m = self.cfg.model
        dtype = jnp.bfloat16 if self.cfg.train.mixed_precision else jnp.float32
        cls = get_model(m.name)
        remat = self.cfg.train.remat
        if m.name == "simple_baseline":
            return cls(backbone=m.backbone, num_keypoints=m.num_keypoints,
                       deconv_channels=tuple(m.deconv_channels), dtype=dtype,
                       remat=remat)
        if m.name == "hrnet":
            return cls(variant=m.backbone, num_keypoints=m.num_keypoints,
                       dtype=dtype, remat=remat)
        if m.name == "dinov3_pose":
            return cls(backbone=m.backbone, num_keypoints=m.num_keypoints,
                       num_classes=m.num_classes,
                       neck_channels=tuple(m.neck_channels),
                       strides=tuple(m.strides),
                       freeze_backbone=m.freeze_backbone,
                       reg_max=self._reg_max(), dtype=dtype, remat=remat)
        if m.name == "deeppose":
            # loss rle implies the (mu, sigma) + flow head — the loss and
            # the head must agree (same coupling precedent as v8/reg_max)
            return cls(backbone=m.backbone, num_keypoints=m.num_keypoints,
                       rle=(self.cfg.loss.name == "rle"), dtype=dtype,
                       remat=remat)
        if m.name == "bottom_up":
            return cls(backbone=m.backbone, num_keypoints=m.num_keypoints,
                       deconv_channels=tuple(m.deconv_channels), dtype=dtype,
                       remat=remat)
        if m.name == "vitpose":
            return cls(backbone=m.backbone, num_keypoints=m.num_keypoints,
                       decoder=m.decoder,
                       deconv_channels=tuple(m.deconv_channels)[:2],
                       freeze_backbone=m.freeze_backbone, dtype=dtype,
                       remat=remat)
        if m.name == "simcc":
            # the bin grid doubles as cfg.model.heatmap_size so the joint
            # transform / evaluator back-projection plumbing is shared —
            # enforce the invariant here rather than fail mysteriously later
            H, W = self.cfg.data.image_size
            r = m.split_ratio
            want = (int(H * r), int(W * r))
            if tuple(m.heatmap_size) != want:
                raise ValueError(
                    f"simcc: model.heatmap_size must equal image_size x "
                    f"split_ratio = {want}, got {tuple(m.heatmap_size)}")
            return cls(backbone=m.backbone, num_keypoints=m.num_keypoints,
                       split_ratio=r, dtype=dtype, remat=remat)
        # registry fallback: pass the common kwargs
        return cls(num_keypoints=m.num_keypoints, dtype=dtype)

    # -- loss ------------------------------------------------------------------
    def loss(self, model=None):
        name = self.cfg.loss.name
        if name == "joints_mse":
            from tpupose.losses.heatmap import joints_mse_loss

            def fn(pred, target, target_weight=None):
                return joints_mse_loss(pred, target, target_weight,
                                       self.cfg.loss.use_target_weight)

            return fn
        if name == "pose_compute":
            from tpupose.losses.pose_loss import ComputeLoss

            return ComputeLoss(
                num_keypoints=self.cfg.model.num_keypoints,
                num_classes=self.cfg.model.num_classes,
                strides=tuple(self.cfg.model.strides),
                kpt_loss_type=self.cfg.loss.kpt_loss_type,
                cls_weight=self.cfg.loss.cls_weight,
                kpt_weight=self.cfg.loss.kpt_weight,
                vis_weight=self.cfg.loss.vis_weight,
            )
        if name == "coord_mse":
            from tpupose.losses.heatmap import coord_mse_loss

            return coord_mse_loss
        if name == "rle":
            import functools

            from tpupose.losses.rle import rle_loss

            return functools.partial(rle_loss,
                                     residual=self.cfg.loss.rle_residual,
                                     q=self.cfg.loss.rle_q)
        if name == "ae":
            import functools

            from tpupose.losses.ae import ae_loss

            lc = self.cfg.loss
            return functools.partial(
                ae_loss, sigma=self.cfg.data.sigma,
                tag_sigma=lc.ae_tag_sigma,
                pull_weight=lc.ae_pull_weight,
                push_weight=lc.ae_push_weight)
        if name == "simcc_kl":
            from tpupose.losses.simcc import simcc_kl_loss

            return simcc_kl_loss
        if name == "joints_mse_weighted":
            from tpupose.losses.heatmap import joints_mse_weighted_loss

            return joints_mse_weighted_loss
        if name == "v8_pose":
            from tpupose.losses.v8 import v8PoseLoss

            return v8PoseLoss(
                num_keypoints=self.cfg.model.num_keypoints,
                num_classes=self.cfg.model.num_classes,
                strides=tuple(self.cfg.model.strides),
                reg_max=self._reg_max(),
            )
        raise ValueError(f"unknown loss {name!r}")

    def _reg_max(self) -> int:
        """v8_pose needs the DFL box branch on the head; the loss and the
        head must agree on one reg_max (ADVICE r1: a head without the box
        channels cannot be trained by v8PoseLoss)."""
        if self.cfg.loss.name == "v8_pose":
            return self.cfg.model.reg_max or 16
        return self.cfg.model.reg_max

    # -- optimizer + schedule ---------------------------------------------------
    def lr_scheduler(self, steps_per_epoch: int):
        t = self.cfg.train
        # with gradient accumulation, optax.MultiSteps advances the inner
        # schedule once per ACCUMULATED update — build the schedule in
        # update units or warmup/decay stretch by grad_accum_steps
        k = max(1, t.grad_accum_steps)
        upd_per_epoch = max(1, steps_per_epoch // k)
        total = t.epochs * upd_per_epoch
        warmup = t.warmup_epochs * upd_per_epoch
        base = make_schedule(self.cfg.lr_scheduler, self.cfg.optimizer.lr,
                             total, warmup, upd_per_epoch)
        head = make_schedule(self.cfg.lr_scheduler, self.cfg.optimizer.head_lr,
                             total, warmup, upd_per_epoch)
        return base, head

    def optimizer(self, params, steps_per_epoch: int, split_lr: bool = True):
        base_sched, head_sched = self.lr_scheduler(steps_per_epoch)
        is_frozen = is_backbone_path if self.cfg.model.freeze_backbone else None
        # head/base labels are independent of freezing (frozen wins in
        # make_optimizer) — freezing the backbone must not silently move
        # the head from head_lr to the base lr
        is_head = (lambda p: not is_backbone_path(p)) if split_lr else None
        tx = make_optimizer(
            self.cfg.optimizer,
            schedule=base_sched,
            head_schedule=head_sched,
            params=params,
            is_head=is_head,
            is_frozen=is_frozen,
            grad_clip_norm=self.cfg.train.grad_clip_norm,
            grad_accum_steps=self.cfg.train.grad_accum_steps,
        )
        return tx

    # -- datasets ---------------------------------------------------------------
    def dataset(self, split: str = "train"):
        d = self.cfg.data
        if d.name == "synthetic":
            from tpupose.data.synthetic import SyntheticTopDownDataset

            n = 256 if split == "train" else 64
            return SyntheticTopDownDataset(
                num_samples=n, image_size=tuple(d.image_size),
                heatmap_size=tuple(self.cfg.model.heatmap_size),
                num_keypoints=self.cfg.model.num_keypoints,
                seed=0 if split == "train" else 1,
            )
        if d.name == "synthetic_yolo":
            from tpupose.data.synthetic import SyntheticYoloPoseDataset

            n = 128 if split == "train" else 32
            return SyntheticYoloPoseDataset(
                num_samples=n, image_size=tuple(d.image_size),
                num_keypoints=self.cfg.model.num_keypoints,
                num_classes=self.cfg.model.num_classes,
                max_instances=d.max_instances,
            )
        if d.name == "yolo_pose":
            from tpupose.data.yolo_pose import YoloPoseDataset

            root = d.train_dir if split == "train" else d.valid_dir
            return YoloPoseDataset(
                image_dir=f"{root}/images", label_dir=f"{root}/labels",
                image_size=tuple(d.image_size),
                num_keypoints=self.cfg.model.num_keypoints,
                max_instances=d.max_instances,
            )
        if d.name == "coco":
            from tpupose.data.coco import CocoTopDownDataset

            return CocoTopDownDataset.from_config(self.cfg, split)
        if d.name == "mpii":
            from tpupose.data.mpii import MpiiTopDownDataset

            return MpiiTopDownDataset.from_config(self.cfg, split)
        raise ValueError(f"unknown dataset {d.name!r}")

    def dataloader(self, dataset, split: str = "train"):
        from tpupose.data.loader import BatchLoader

        bs = self.cfg.train.batch_size if split == "train" else self.cfg.eval.batch_size
        bs = min(bs, len(dataset)) if len(dataset) else bs
        # eval: keep every sample but pad the tail batch to a static shape
        # (one XLA compile of the eval program, no tail retrace)
        return BatchLoader(dataset, batch_size=bs, shuffle=(split == "train"),
                           drop_last=(split == "train"), seed=self.cfg.train.seed,
                           num_workers=self.cfg.data.num_workers,
                           pad_last=(split != "train"))
