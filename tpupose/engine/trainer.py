"""Trainer: the epoch loop.

Capability parity with the reference trainers
(pose/pose/engine/trainer.py:9-142 — epoch loop, warmup, tqdm-style live
loss, periodic + best-by-train-loss checkpoints, loss-only validate;
HPE/engine/trainer.py:7-117 — AverageMeter metric reporting, log.txt).

TPU-native shape: warmup lives inside the optax schedule (per-step, not a
per-epoch lr mutation); the step is one jitted program; batches stream
through a device prefetch queue; timing uses block_until_ready for honest
images/sec (SURVEY.md §5.1).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpupose.configs.default import Config
from tpupose.engine.builder import Builder
from tpupose.engine.checkpoint import CheckpointManager
from tpupose.engine.train_state import (
    create_train_state, make_heatmap_eval_step, make_heatmap_train_step,
    make_regression_train_step, make_simcc_train_step, make_yolo_train_step,
)
from tpupose.ops.heatmap import gaussian_heatmaps
from tpupose.utils.logging import FileLogger, printM, printS, printT
from tpupose.utils.meters import MetricDict
from tpupose.utils.seed import set_seed


class Trainer:
    def __init__(self, cfg: Config, builder: Builder | None = None):
        self.cfg = cfg
        self.builder = builder or Builder(cfg)
        self.mesh_mgr = self.builder.set_device()
        self.rng = set_seed(cfg.train.seed, cfg.train.deterministic)

        self.model = self.builder.model()
        self.train_ds = self.builder.dataset("train")
        self.valid_ds = self.builder.dataset("valid")
        self.train_loader = self.builder.dataloader(self.train_ds, "train")
        self.valid_loader = self.builder.dataloader(self.valid_ds, "valid")

        steps_per_epoch = max(len(self.train_loader), 1)
        self.steps_per_epoch = steps_per_epoch

        H, W = cfg.data.image_size
        sample = jnp.zeros((1, H, W, 3), jnp.float32)
        self.rng, init_rng = jax.random.split(self.rng)
        # shape-only probe: the optimizer needs the param TREE for its
        # path labels, not values — eval_shape avoids running a second
        # full init (create_train_state does the real one)
        params_probe = jax.eval_shape(
            lambda r: self.model.init(r, sample, train=False),
            init_rng)["params"]
        tx = self.builder.optimizer(params_probe, steps_per_epoch)
        self.state = create_train_state(
            self.model, init_rng, sample, tx,
            ema_decay=getattr(cfg.train, "ema_decay", 0.0))
        if cfg.model.pretrained:
            from tpupose.models.pretrained import load_pretrained

            params, batch_stats = load_pretrained(
                dict(self.state.params), cfg.model.pretrained,
                cfg.model.backbone,
                batch_stats=dict(self.state.batch_stats))
            ema = (jax.tree_util.tree_map(jnp.array, params)
                   if self.state.ema_params is not None else None)
            self.state = self.state.replace(params=params,
                                            batch_stats=batch_stats,
                                            ema_params=ema)
        # place state on the mesh: DP replicates; mesh.model>1 shards wide
        # kernels (and their optimizer moments) over the 'model' axis
        self.state = self.mesh_mgr.shard_state(self.state)

        if cfg.loss.name in ("pose_compute", "v8_pose"):
            self.family = "yolo"
        elif cfg.loss.name == "coord_mse":
            self.family = "regression"
        elif cfg.loss.name == "rle":
            self.family = "rle"
        elif cfg.loss.name == "simcc_kl":
            self.family = "simcc"
        elif cfg.loss.name == "ae":
            self.family = "bottom_up"
        else:
            self.family = "heatmap"
        self.loss_fn = self.builder.loss(self.model)
        if self.family == "regression":
            self.train_step = make_regression_train_step(self.loss_fn)
            self.eval_step = make_heatmap_eval_step()  # plain forward
        elif self.family == "rle":
            from tpupose.engine.train_state import make_rle_train_step
            from tpupose.ops.preprocess import normalize_images as _norm

            self.train_step = make_rle_train_step(self.loss_fn)

            def _rle_val_step(state, images, target, vis):
                mu, sigma, log_phi = state.apply_fn(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    _norm(images), train=False, target=target)
                return self.loss_fn(mu, sigma, log_phi, target, vis)

            self.val_step = jax.jit(_rle_val_step)
            # forward-only (target=None) returns (mu, sigma); mu feeds the
            # PCK/PCKh/EPE eval in evaluate_regression
            self.eval_step = make_heatmap_eval_step()
        elif self.family == "bottom_up":
            from tpupose.engine.train_state import make_bottom_up_train_step
            from tpupose.ops.preprocess import normalize_images as _bu_norm

            self.train_step = make_bottom_up_train_step(self.loss_fn)

            def _bu_val_step(state, images, keypoints, instance_mask):
                pred = state.apply_fn(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    _bu_norm(images), train=False)
                loss, _ = self.loss_fn(pred, keypoints, instance_mask)
                return loss

            self.val_step = jax.jit(_bu_val_step)
        elif self.family == "yolo":
            self.train_step = make_yolo_train_step(
                self.loss_fn,
                mosaic_prob=getattr(cfg.data, "mosaic_prob", 0.0),
                mosaic_seed=cfg.train.seed)

            def _val_step(state, batch):
                from tpupose.ops.preprocess import normalize_images

                imgs = normalize_images(batch["images"], scale_only=True)
                preds, _ = state.apply_fn(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    imgs, train=True, mutable=["batch_stats"])
                targets = {k: batch[k] for k in
                           ("boxes", "classes", "keypoints", "instance_mask")}
                targets["sample_mask"] = batch["sample_mask"]
                total, _ = self.loss_fn(preds, targets)
                return total

            self.val_step = jax.jit(_val_step)
        elif self.family == "simcc":
            dev_aff = getattr(cfg.data, "device_affine", False)
            self.train_step = make_simcc_train_step(
                self.loss_fn,
                bins_hw=tuple(cfg.model.heatmap_size),
                sigma=cfg.data.simcc_sigma,
                color_jitter_strength=cfg.data.color_jitter,
                jitter_seed=cfg.train.seed,
                affine_rotation=cfg.data.rotation_factor if dev_aff else 0.0,
                affine_scale=cfg.data.scale_factor if dev_aff else 0.0,
                udp=getattr(cfg.data, "udp", False))
            self.eval_step = make_heatmap_eval_step()  # plain forward
        else:
            dev_aff = getattr(cfg.data, "device_affine", False)
            teacher_apply = None
            if getattr(cfg.train, "distill_cfg", ""):
                teacher_apply = self._build_teacher(sample)
            step = make_heatmap_train_step(
                self.loss_fn,
                color_jitter_strength=cfg.data.color_jitter,
                jitter_seed=cfg.train.seed,
                heatmap_size=tuple(cfg.model.heatmap_size),
                sigma=cfg.data.sigma,
                affine_rotation=cfg.data.rotation_factor if dev_aff else 0.0,
                affine_scale=cfg.data.scale_factor if dev_aff else 0.0,
                udp=getattr(cfg.data, "udp", False),
                teacher_apply=teacher_apply,
                distill_weight=cfg.train.distill_weight)
            if teacher_apply is not None:
                self.train_step = (lambda s, b:
                                   step(s, b, self._teacher_vars))
            else:
                self.train_step = step
            self.eval_step = make_heatmap_eval_step()

        exp_dir = os.path.join(cfg.train.output_dir, cfg.train.experiment)
        self.file_log = FileLogger(os.path.join(exp_dir, "log.txt"))
        from tpupose.utils.tensorboard import SummaryWriter

        self.tb = SummaryWriter(os.path.join(exp_dir, "tb")
                                if cfg.train.tensorboard else "")
        self.ckpt = CheckpointManager(os.path.join(exp_dir, "ckpt"),
                                      interval=cfg.train.ckpt_interval)
        if cfg.model.checkpoint:
            self.load_checkpoint(cfg.model.checkpoint)

    # ------------------------------------------------------------------
    def _build_teacher(self, sample):
        """Load the distillation teacher (train.distill_cfg/_ckpt): build
        its model from its own config, restore its weights, enforce output
        compatibility, and return its apply_fn; the variables land on the
        mesh (replicated) in self._teacher_vars and are fed to the train
        step per-call, so they are not baked into the program as
        constants."""
        import optax

        from tpupose.configs.parser import load_config

        cfg = self.cfg
        tcfg = load_config(cfg.train.distill_cfg)
        from tpupose.cli.serve import HEATMAP_FAMILIES
        if tcfg.model.name not in HEATMAP_FAMILIES:
            # a simcc/deeppose/yolo teacher returns tuples/coords, which
            # would fail joints_mse_loss at trace time with an opaque
            # shape error — reject it with a clear one instead
            raise ValueError(
                "distill teacher must be a heatmap-family model "
                f"{HEATMAP_FAMILIES}; got model.name={tcfg.model.name!r} "
                f"from {cfg.train.distill_cfg}")
        if (tuple(tcfg.model.heatmap_size) != tuple(cfg.model.heatmap_size)
                or tcfg.model.num_keypoints != cfg.model.num_keypoints):
            raise ValueError(
                "distill teacher must emit the student's heatmap grid: "
                f"teacher {tcfg.model.heatmap_size}/"
                f"{tcfg.model.num_keypoints}kp vs student "
                f"{cfg.model.heatmap_size}/{cfg.model.num_keypoints}kp")
        if tuple(tcfg.data.image_size) != tuple(cfg.data.image_size):
            raise ValueError(
                "distill teacher must consume the student's input size "
                f"(teacher {tcfg.data.image_size} vs student "
                f"{cfg.data.image_size}) — both run on the same batch")
        teacher = Builder(tcfg).model()
        tstate = create_train_state(teacher, jax.random.PRNGKey(0), sample,
                                    optax.sgd(0.0))
        if cfg.train.distill_ckpt:
            from tpupose.engine.checkpoint import restore_path

            tstate, _ = restore_path(tstate, cfg.train.distill_ckpt)
        else:
            printT("distill: no distill_ckpt given — random teacher "
                   "(tests only)")
        self._teacher_vars = self.mesh_mgr.replicate(
            {"params": tstate.params, "batch_stats": tstate.batch_stats})
        printT(f"distill: teacher {tcfg.model.name}/{tcfg.model.backbone} "
               f"(w={cfg.train.distill_weight})")
        return teacher.apply

    # ------------------------------------------------------------------
    def _prefetched(self, loader, depth: int = 2):
        """Device prefetch: place the next `depth` prepared batches on the
        mesh ahead of consumption (device_put is async) so host collation
        + H2D transfer overlap the compiled step — the pinned-memory/
        prefetch_factor analog (HPE/train.py:72-79). Host-side parallelism
        comes from BatchLoader's worker threads."""
        import collections

        buf = collections.deque()
        for batch in loader:
            buf.append(self._prepare_batch(batch))
            if len(buf) >= depth:
                yield buf.popleft()
        while buf:
            yield buf.popleft()

    def _prepare_batch(self, batch, for_eval: bool = False):
        """Host batch dict -> device (mesh-sharded) batch.

        Heatmap family ships images + the tiny joint arrays; the Gaussian
        targets are rendered inside the jitted train step. Eval keeps the
        precomputed-target form for the loss-only validate path."""
        if self.family == "yolo":
            return self.mesh_mgr.shard_batch(
                {k: batch[k] for k in
                 ("images", "boxes", "classes", "keypoints", "instance_mask")})
        if self.family == "bottom_up":
            return self.mesh_mgr.shard_batch(
                {k: batch[k] for k in
                 ("images", "keypoints", "instance_mask")})
        if self.family in ("regression", "rle"):
            Hh, Wh = self.cfg.model.heatmap_size
            dev = self.mesh_mgr.shard_batch(
                {"images": batch["images"], "joints": batch["joints"],
                 "visibility": batch["visibility"]})
            coords = dev["joints"] / jnp.array([Wh, Hh], jnp.float32)
            return {"images": dev["images"], "target_coords": coords,
                    "visibility": dev["visibility"]}
        dev = self.mesh_mgr.shard_batch(
            {"images": batch["images"], "joints": batch["joints"],
             "visibility": batch["visibility"]}
        )
        if not for_eval:
            return dev
        if self.family == "simcc":
            from tpupose.losses.simcc import gaussian_1d_targets

            tx, ty, tw = gaussian_1d_targets(
                dev["joints"], dev["visibility"],
                tuple(self.cfg.model.heatmap_size),
                self.cfg.data.simcc_sigma)
            return {"images": dev["images"], "target": (tx, ty),
                    "target_weight": tw}
        hm_size = tuple(self.cfg.model.heatmap_size)
        target, tw = gaussian_heatmaps(dev["joints"], dev["visibility"],
                                       hm_size, self.cfg.data.sigma)
        # NKHW -> NHWK to match the head's NHWC output
        target = jnp.transpose(target, (0, 2, 3, 1))
        return {"images": dev["images"], "target": target, "target_weight": tw}

    def iter_one_epoch(self, epoch: int) -> float:
        meters = MetricDict()
        t0 = time.perf_counter()
        n_img = 0
        metrics = None
        logged = True   # last step's metrics already counted into meters?
        profile_dir = getattr(self.cfg.train, "profile_dir", "")
        for step, db in enumerate(self._prefetched(self.train_loader)):
            if profile_dir and epoch == 0 and step == 10:
                # one profiled step (SURVEY.md §5.1: jax.profiler hooks)
                jax.profiler.start_trace(profile_dir)
            self.state, metrics = self.train_step(self.state, db)
            if profile_dir and epoch == 0 and step == 10:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
            self._check_exit_signal()   # preemption: ckpt at step boundary
            n_img += db["images"].shape[0]
            logged = (step + 1) % self.cfg.train.log_interval == 0 or step == 0
            if logged:
                m = jax.device_get(metrics)
                meters.update(m)
                printT(f"epoch {epoch} step {step + 1}/{self.steps_per_epoch} "
                       f"loss={m['loss']:.5f} gnorm={m['grad_norm']:.3f}")
                self.tb.add_scalars(m, int(self.state.step), prefix="train/")
        if metrics is not None and not logged:
            # flush the final step — unless the loop body just counted it
            # (double-updating would weight it twice in the epoch average
            # that drives best-checkpoint selection)
            jax.block_until_ready(metrics["loss"])
            m = jax.device_get(metrics)
            meters.update(m)
        dt = time.perf_counter() - t0
        ips = n_img / max(dt, 1e-9)
        printM(f"epoch {epoch}: {meters.format()} ({ips:.1f} img/s)")
        self.file_log.log(f"epoch {epoch}: {meters.format()} ({ips:.1f} img/s)")
        self.tb.add_scalar("train/img_per_s", ips, int(self.state.step))
        return meters["loss"].avg if "loss" in meters._meters else float("inf")

    def validate(self) -> float:
        """Loss-only validation (the reference's validate computes loss only,
        pose/pose/engine/trainer.py:101-102 — here it's actually wired in).

        Eval loaders pad the tail batch to a static shape (pad_last);
        padded duplicate rows are excluded from the loss by zeroing their
        per-sample weights (target_weight / visibility / instance_mask —
        the loss fns normalize by the weight sum, so the masked mean is
        exact) and batches are combined weighted by real-sample count.

        With train.ema_decay, validation runs on the EMA weights (the
        weights serving would use)."""
        total, n = 0.0, 0
        eval_state = self.state.for_eval()
        for batch in self.valid_loader:
            pm = batch.get("pad_mask")
            db = self._prepare_batch(batch, for_eval=True)
            n_real = int(pm.sum()) if pm is not None else len(batch["images"])
            if self.family == "yolo":
                # per-image weight for the cls term (which scores ALL
                # cells, not just instance positives — zeroing
                # instance_mask alone leaves padded rows' confident
                # predictions counted against all-zero targets).
                # Always present so the jitted val step traces once.
                db = dict(db)
                db["sample_mask"] = jnp.asarray(
                    pm.astype(np.float32) if pm is not None
                    else np.ones(len(batch["images"]), np.float32))
            if pm is not None and not bool(pm.all()):
                m = jnp.asarray(pm.astype(np.float32))
                db = dict(db)
                if self.family in ("yolo", "bottom_up"):
                    db["instance_mask"] = db["instance_mask"] * m[:, None]
                elif self.family in ("regression", "rle"):
                    db["visibility"] = db["visibility"] * m[:, None]
                else:
                    db["target_weight"] = db["target_weight"] * m[:, None]
            if self.family == "yolo":
                loss = self.val_step(eval_state, db)
            elif self.family == "bottom_up":
                loss = self.val_step(eval_state, db["images"],
                                     db["keypoints"], db["instance_mask"])
            elif self.family == "rle":
                loss = self.val_step(eval_state, db["images"],
                                     db["target_coords"], db["visibility"])
            elif self.family == "regression":
                preds = self.eval_step(eval_state, db["images"])
                loss = self.loss_fn(preds, db["target_coords"],
                                    db["visibility"])
            else:
                preds = self.eval_step(eval_state, db["images"])
                loss = self.loss_fn(preds, db["target"], db["target_weight"])
            total += float(loss) * n_real
            n += n_real
        if n == 0:
            from tpupose.utils.logging import printW

            printW("validation loader produced no batches")
            return float("nan")
        return total / n

    def _build_eval_metrics(self):
        """Metric objects from cfg.eval.metrics (the reference metric
        registry analog, HPE/core/metric/__init__.py:1-18 — with OKS-AP,
        the COCO keypoint mAP, actually wired in)."""
        K = self.cfg.model.num_keypoints
        out = []
        for name in self.cfg.eval.metrics:
            if name == "pck":
                from tpupose.metrics.pck import PCK

                out.append(PCK(alpha=0.2))
            elif name == "pckh":
                from tpupose.metrics.pckh import PCKh

                out.append(PCKh())
            elif name == "mpjpe":
                from tpupose.metrics.mpjpe import MPJPE

                out.append(MPJPE())
            elif name == "oks_ap":
                from tpupose.metrics.oks_ap import OKSAP

                out.append(OKSAP(num_classes=1))
            elif name == "auc":
                from tpupose.metrics.auc import AUC

                out.append(AUC())
            elif name == "epe":
                from tpupose.metrics.auc import EPE

                out.append(EPE())
            else:
                raise ValueError(f"unknown eval metric {name!r}")
        return out

    def _get_evaluator(self):
        """Build the jitted evaluator once; refresh its state per call.

        With eval.int8 the evaluator is REBUILT (recompiled) every call:
        activation amax scales are jit-time constants calibrated against
        the current weights, so reusing the epoch-1 program would clip
        later epochs' activations to stale ranges (and mutating
        .quant_scales would not retrace anyway)."""
        rebuild_each = self.cfg.eval.int8 or self.cfg.eval.int8_engine
        if getattr(self, "_evaluator", None) is None or rebuild_each:
            from tpupose.engine.evaluator import TopDownEvaluator

            # flip pairs come from the dataset (COCO/MPII define theirs);
            # datasets without a joint-order convention flip unpaired.
            pairs = getattr(self.valid_ds, "flip_pairs", None)
            if pairs is None and self.cfg.model.num_keypoints != 17:
                pairs = np.zeros((0, 2), np.int64)
            # int8 paths calibrate on the first validation batch against
            # the CURRENT weights — fetched once, shared by both paths
            first = None
            if self.cfg.eval.int8 or self.cfg.eval.int8_engine:
                try:
                    first = next(iter(self.valid_loader))
                except StopIteration:
                    raise ValueError(
                        "eval.int8/int8_engine need at least one "
                        "validation batch for activation calibration")
            # eval.int8: quantized eval serving (ops/quant.py)
            quant_scales = None
            if self.cfg.eval.int8:
                from tpupose.engine.predictor import HeatmapPredictor

                quant_scales = HeatmapPredictor.calibrate_int8(
                    self.state.for_eval(), np.asarray(first["images"]))
            # eval.int8_engine: the fused int8-activation graph (BN +
            # normalize folded into the convs) — SimpleBaseline/HRNet
            # heatmap families
            engine = None
            if self.cfg.eval.int8_engine:
                from tpupose.ops.int8_engine import Int8Engine

                bb = self.cfg.model.backbone
                if self.family != "heatmap" or not (
                        bb.startswith("resnet") or bb.startswith("hrnet")):
                    raise ValueError(
                        "eval.int8_engine supports the SimpleBaseline/"
                        f"HRNet heatmap families only (got family="
                        f"{self.family!r}, backbone={bb!r})")
                es = self.state.for_eval()
                engine = Int8Engine.build(
                    {"params": es.params, "batch_stats": es.batch_stats},
                    backbone=bb, calib=np.asarray(first["images"]),
                    decode_method=self.cfg.eval.decode,
                    blur_kernel=self.cfg.eval.blur_kernel)
            self._evaluator = TopDownEvaluator(
                self.state.for_eval(), tuple(self.cfg.model.heatmap_size),
                decode=self.cfg.eval.decode,
                flip_test=self.cfg.eval.flip_test,
                flip_pairs=pairs,
                blur_kernel=self.cfg.eval.blur_kernel,
                sigma=self.cfg.data.sigma,
                shard_fn=self.mesh_mgr.shard_batch,
                quant_scales=quant_scales,
                family=("simcc" if self.family == "simcc" else "heatmap"),
                udp=getattr(self.cfg.data, "udp", False),
                int8_engine=engine)
        self._evaluator.state = self.state.for_eval()
        return self._evaluator

    def _eval_batches(self):
        """Wrap the valid loader so every batch carries GT joints in source
        coords (synthetic sets store joints in heatmap coords only)."""
        from tpupose.ops.affine import transform_preds

        if getattr(self, "_project_joints", None) is None:
            hm_size = tuple(self.cfg.model.heatmap_size)
            udp = getattr(self.cfg.data, "udp", False)
            # cached: a fresh jit per evaluate() would recompile each eval
            self._project_joints = jax.jit(jax.vmap(
                lambda c, ct, sc: transform_preds(c, ct, sc, hm_size,
                                                  udp=udp)))
        project = self._project_joints
        for batch in self.valid_loader:
            if "joints_src" not in batch:
                batch = dict(batch)
                batch["joints_src"] = np.asarray(project(
                    jnp.asarray(batch["joints"]),
                    jnp.asarray(batch["center"]),
                    jnp.asarray(batch["scale"])))
            yield batch

    def evaluate(self) -> dict:
        """Metric evaluation for the heatmap family: flip-test + DARK +
        back-projection + PCK/MPJPE/OKS-AP over the valid set (the
        reference only ever wires loss, SURVEY.md §5.5 — this runs the
        real metric library, including COCO keypoint mAP). The simcc
        family runs the same pipeline through its fused 1D-bin evaluator
        (family='simcc' in _get_evaluator)."""
        if self.family == "bottom_up":
            out = self.evaluate_bottom_up()
            printM("eval: " + " ".join(f"{k}={v:.4f}" for k, v in out.items()))
            return out
        if self.family == "yolo":
            out = {"val_loss": self.validate()}
            out.update(self.evaluate_yolo())
            printM("eval: " + " ".join(f"{k}={v:.4f}" for k, v in out.items()))
            return out
        if self.family in ("regression", "rle"):
            out = {"val_loss": self.validate()}
            out.update(self.evaluate_regression())
            printM("eval: " + " ".join(f"{k}={v:.4f}" for k, v in out.items()))
            return out
        if self.family not in ("heatmap", "simcc"):
            return {"val_loss": self.validate()}
        ev = self._get_evaluator()
        out = ev.run(self._eval_batches(), self._build_eval_metrics(),
                     results_path=(getattr(self.cfg.eval, "dump_results", "")
                                   or None))
        det_file = getattr(self.cfg.eval, "det_boxes", "")
        if det_file:
            # reuse this epoch's evaluator — _get_evaluator would rebuild
            # (and recalibrate) the whole int8 program a second time
            out.update(self.evaluate_detections(det_file, evaluator=ev))
        printM("eval: " + " ".join(f"{k}={v:.4f}" for k, v in out.items()))
        return out

    def evaluate_bottom_up(self) -> dict:
        """Detector-free multi-person eval: forward + AE grouping decode
        in one jitted program per batch, scored by COCO OKS-AP against the
        padded GT instances (losses/ae + ops/ae_decode)."""
        from tpupose.metrics.oks_ap import OKSAP
        from tpupose.models.bottom_up import BottomUpPose
        from tpupose.ops.ae_decode import decode_ae
        from tpupose.ops.preprocess import normalize_images

        from tpupose.ops.decode import flip_back

        import itertools

        ecfg = self.cfg.eval
        max_people = self.cfg.data.max_instances
        # flip-test: mirror-average the heatmaps (left/right joints
        # swapped via the dataset's flip pairs); tags come from the direct
        # pass — a flipped forward embeds in a different tag space, so
        # they don't average. Without flip pairs (yolo-format datasets
        # carry no joint-order convention) mirroring would average each
        # joint channel with its contralateral location — disabled.
        pairs = np.asarray(getattr(self.valid_loader.dataset, "flip_pairs",
                                   np.zeros((0, 2), np.int64)))
        flip_test = bool(getattr(ecfg, "flip_test", False)) and len(pairs) > 0

        # eval.int8: quantized serving path, scales calibrated against the
        # current weights on the first eval batch (same policy as the
        # heatmap family's evaluator rebuild)
        batches = iter(self.valid_loader)
        eval_state = self.state.for_eval()
        scales_map = None
        if getattr(ecfg, "int8", False):
            try:
                first = next(batches)
            except StopIteration:
                first = None
            batches = itertools.chain([first] if first is not None else [],
                                      batches)
            if first is not None:
                from tpupose.engine.predictor import BottomUpPredictor

                scales_map = BottomUpPredictor.calibrate_int8(
                    eval_state, np.asarray(first["images"]))

        def _decode_fn(state, images):
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}

            def fwd(x):
                if scales_map is not None:
                    from tpupose.ops.quant import quantized_apply

                    return quantized_apply(state.apply_fn, variables,
                                           scales_map, normalize_images(x),
                                           train=False)
                return state.apply_fn(variables, normalize_images(x),
                                      train=False)

            hm, tg = BottomUpPose.split(fwd(images))
            if flip_test:
                hm_f, _ = BottomUpPose.split(fwd(images[:, :, ::-1]))
                hm = 0.5 * (hm + flip_back(hm_f, pairs))
            return decode_ae(
                hm, tg, max_people=max_people,
                score_threshold=getattr(ecfg, "ae_score_threshold", 0.1),
                tag_threshold=getattr(ecfg, "ae_tag_threshold", 1.0))

        if scales_map is not None:
            # int8 scales are trace constants calibrated against the
            # current weights — a fresh jit per eval is required
            _decode_step = jax.jit(_decode_fn)
        else:
            # cache across eval epochs: the decode config is fixed for the
            # run, so a fresh jit each evaluate() would recompile the full
            # forward(+flip)+grouping program every epoch
            if getattr(self, "_bu_decode_step", None) is None:
                self._bu_decode_step = jax.jit(_decode_fn)
            _decode_step = self._bu_decode_step

        H, W = self.cfg.data.image_size
        Hh, Wh = self.cfg.model.heatmap_size
        stride = np.array([W / Wh, H / Hh], np.float32)
        ap = OKSAP(num_classes=1)
        for batch in batches:
            pm = batch.get("pad_mask",
                           np.ones(len(batch["images"]), bool))
            out = jax.device_get(_decode_step(eval_state, batch["images"]))
            kpts = np.asarray(batch["keypoints"])     # (B, M, K, 3) normalized
            imask = np.asarray(batch["instance_mask"]) > 0
            for i in range(len(batch["images"])):
                if not pm[i]:
                    continue
                gt_px = kpts[i, :, :, :2] * np.array([W, H], np.float32)
                gt_vis = kpts[i, :, :, 2]
                # bbox span over LABELED joints only — occluded joints sit
                # at (0, 0) in yolo labels and would anchor the box at the
                # origin, inflating the OKS area
                v = (gt_vis > 0)[..., None]
                hi = np.where(v, gt_px, -np.inf).max(axis=1)
                lo = np.where(v, gt_px, np.inf).min(axis=1)
                span = np.nan_to_num(hi - lo, posinf=0.0, neginf=0.0)
                ap.update(out["coords"][i] * stride, out["person_scores"][i],
                          gt_px, gt_vis, span[:, 0] * span[:, 1],
                          pred_valid=np.asarray(out["person_mask"][i]),
                          gt_valid=imask[i])
        res = ap.compute()
        # val_loss intentionally not recomputed here: train() runs
        # validate() right before evaluate() (same as the other families)
        return {k: float(v) for k, v in res.items()
                if isinstance(v, (int, float, np.floating))}

    def evaluate_yolo(self) -> dict:
        """COCO keypoint mAP for the single-stage (YOLO-pose) family: the
        fused forward + grid decode + on-device NMS (YoloPosePredictor)
        over the valid set, OKS-NMS instance dedup, scored by OKS-AP.

        This is the metric the reference's registry aliases for exactly
        this family (PMet=OKSAP, HPE/core/metric/__init__.py:1-18; legacy
        trainer intent HPE/engine/trainer.py:110-114) but never wires into
        a working trainer — here it runs each eval epoch / --test."""
        from tpupose.engine.predictor import YoloPosePredictor
        from tpupose.metrics.oks_ap import OKSAP
        from tpupose.ops.oks_nms import oks_nms

        cfg = self.cfg
        ecfg = cfg.eval
        H, W = cfg.data.image_size
        nc = cfg.model.num_classes
        pred = YoloPosePredictor(
            self.state.for_eval(), num_classes=nc,
            num_keypoints=cfg.model.num_keypoints,
            conf_threshold=ecfg.conf_threshold,
            iou_threshold=ecfg.iou_threshold,
            max_detections=ecfg.max_detections,
            has_box_branch=(cfg.model.reg_max > 0
                            or cfg.loss.name == "v8_pose"))
        ap = OKSAP(num_classes=nc)
        for batch in self.valid_loader:
            pm = batch.get("pad_mask")
            if pm is None:
                pm = np.ones(len(batch["images"]), bool)
            det = pred(batch["images"])
            gt_kpts = np.asarray(batch["keypoints"])    # (B,M,K,3) normalized
            gt_boxes = np.asarray(batch["boxes"])       # (B,M,4) norm cxcywh
            gt_cls = np.asarray(batch["classes"])
            imask = np.asarray(batch["instance_mask"]) > 0
            for i in range(len(batch["images"])):
                if not pm[i]:
                    continue
                keep = np.where(det["valid"][i] > 0)[0]
                pk = det["keypoints"][i][..., :2]
                kv = det["keypoints"][i][..., 2]
                ps = det["scores"][i]
                pb = det["boxes"][i]
                pa = (np.maximum(pb[:, 2] - pb[:, 0], 0.0)
                      * np.maximum(pb[:, 3] - pb[:, 1], 0.0))
                if keep.size and ecfg.det_nms == "oks":
                    # official-protocol instance dedup (ops/oks_nms.py):
                    # box NMS on device already ran; OKS-NMS removes
                    # same-pose duplicates that survive box IoU
                    kept = oks_nms(pk[keep], ps[keep], pa[keep],
                                   threshold=ecfg.det_nms_threshold,
                                   kscores=kv[keep],
                                   vis_threshold=ecfg.det_vis_threshold)
                    keep = keep[kept]
                gt_px = gt_kpts[i, :, :, :2] * np.array([W, H], np.float32)
                gt_vis = gt_kpts[i, :, :, 2]
                gt_area = (gt_boxes[i, :, 2] * W) * (gt_boxes[i, :, 3] * H)
                ap.update(pk[keep], ps[keep], gt_px, gt_vis, gt_area,
                          pred_cls=det["classes"][i][keep],
                          gt_cls=gt_cls[i], gt_valid=imask[i],
                          pred_area=pa[keep])
        res = ap.compute()
        return {k: float(v) for k, v in res.items()
                if isinstance(v, (int, float, np.floating))}

    def evaluate_regression(self) -> dict:
        """PCK/PCKh/EPE for the coordinate-regression family (DeepPose /
        RLE) — the MPII DeepPose protocol: PCKh@0.5 with the head-segment
        normalizer from the two head joints (reference:
        HPE/core/metric/pckh.py:36-77, never wired into a trainer there).

        Predictions (normalized coords) and GT are compared in SOURCE
        pixels when the dataset provides center/scale (MPII/COCO
        top-down); otherwise in heatmap-grid coords — a consistent frame,
        so the normalized PCK/PCKh are unaffected and EPE is reported in
        that frame's units."""
        eval_state = self.state.for_eval()
        Hh, Wh = self.cfg.model.heatmap_size
        K = self.cfg.model.num_keypoints

        metrics = []
        for name in self.cfg.eval.metrics:
            if name == "pck":
                from tpupose.metrics.pck import PCK
                metrics.append(PCK(alpha=0.2))
            elif name == "pckh":
                from tpupose.metrics.pckh import PCKh
                if K > 9:   # needs the MPII head joints (9=top, 8=neck)
                    metrics.append(PCKh())
                else:
                    from tpupose.utils.logging import printW
                    printW(f"eval metric 'pckh' requested but the model "
                           f"has only {K} keypoints (PCKh needs the MPII "
                           f"head joints 8/9) — skipping it")
            elif name == "mpjpe":
                from tpupose.metrics.mpjpe import MPJPE
                metrics.append(MPJPE())
            elif name == "auc":
                from tpupose.metrics.auc import AUC
                metrics.append(AUC())
            elif name == "epe":
                from tpupose.metrics.auc import EPE
                metrics.append(EPE())
            # oks_ap is instance-level; not applicable to this family
        if not metrics:
            from tpupose.metrics.pck import PCK
            metrics = [PCK(alpha=0.2)]

        for batch in self._eval_batches():
            preds = self.eval_step(eval_state, batch["images"])
            if isinstance(preds, tuple):   # RLE returns (mu, sigma)
                preds = preds[0]
            pred_hm = np.asarray(preds, np.float32) * [Wh, Hh]
            vis = np.asarray(batch["visibility"], np.float32)
            pm = batch.get("pad_mask")
            if pm is not None:
                vis = vis * pm[:, None]
            if "center" in batch:
                # back-project both to source pixels through the same
                # affine the heatmap family uses (_eval_batches caches
                # the jitted vmap of transform_preds)
                pred_src = np.asarray(self._project_joints(
                    jnp.asarray(pred_hm), jnp.asarray(batch["center"]),
                    jnp.asarray(batch["scale"])))
                gt_src = np.asarray(batch["joints_src"])
            else:
                pred_src = pred_hm
                gt_src = np.asarray(batch["joints"], np.float32)
            for m in metrics:
                m.update(pred_src, gt_src, vis)
        out = {}
        for m in metrics:
            out.update({k: float(v) for k, v in m.compute().items()
                        if isinstance(v, (int, float, np.floating))})
        return out

    def evaluate_detections(self, det_file: str, evaluator=None) -> dict:
        """Official COCO top-down protocol: crops from DETECTOR boxes
        (a COCO detection-results JSON) instead of GT boxes, scored by
        OKS-AP greedy matching against the val annotations. Results are
        prefixed det_* so both protocols can be reported side by side."""
        import os as _os

        from tpupose.engine.det_eval import (DetectionCropDataset,
                                             evaluate_detections)

        from tpupose.utils.logging import printW

        d = self.cfg.data
        if d.name != "coco":
            printW("eval.det_boxes requires data.name=coco; skipping")
            return {}
        ds = DetectionCropDataset(
            image_dir=_os.path.join(d.root, "val2017"),
            ann_file=_os.path.join(d.root, "annotations",
                                   "person_keypoints_val2017.json"),
            det_file=det_file,
            image_size=tuple(d.image_size),
            heatmap_size=tuple(self.cfg.model.heatmap_size),
            num_keypoints=self.cfg.model.num_keypoints,
            score_threshold=getattr(self.cfg.eval, "det_score_threshold",
                                    0.0),
            max_per_image=getattr(self.cfg.eval, "det_max_per_image", 100),
            udp=getattr(d, "udp", False))
        out = evaluate_detections(
            evaluator if evaluator is not None else self._get_evaluator(), ds,
            batch_size=self.cfg.eval.batch_size,
            num_workers=d.num_workers,
            nms=getattr(self.cfg.eval, "det_nms", "oks"),
            nms_threshold=getattr(self.cfg.eval, "det_nms_threshold", 0.9),
            vis_threshold=getattr(self.cfg.eval, "det_vis_threshold", 0.2))
        return {f"det_{k}": v for k, v in out.items()}

    def train(self):
        cfg = self.cfg.train
        start_epoch = int(self.state.step) // self.steps_per_epoch
        with self._checkpoint_on_signal():
            self._train_epochs(start_epoch, cfg.epochs)

    def _checkpoint_on_signal(self):
        """SIGTERM/SIGINT during train() saves a resumable checkpoint
        before exiting — the TPU-pod preemption story (the reference's
        handlers only tear the process group down, HPE/utils/dist.py:64-67;
        here the checkpoint IS the recovery path, SURVEY.md §5.3)."""
        import contextlib
        import signal as _signal

        @contextlib.contextmanager
        def guard():
            def handler(signum, frame):
                # DEFERRED: the train step donates the previous state's
                # buffers (donate_argnums), so a signal landing inside the
                # step call would see an invalidated self.state — saving
                # here could fail. Set a flag; the train loop checkpoints
                # at the next step boundary where the state is whole.
                if getattr(self, "_exit_signal", None) is not None:
                    raise SystemExit(128 + signum)   # second signal: force
                self._exit_signal = signum
                printM(f"signal {signum}: will checkpoint at the next "
                       f"step boundary (signal again to force exit)")

            self._exit_signal = None
            prev = {}
            for sig in (_signal.SIGTERM, _signal.SIGINT):
                try:
                    prev[sig] = _signal.signal(sig, handler)
                except (ValueError, OSError):  # non-main thread
                    pass
            try:
                yield
            finally:
                for sig, old in prev.items():
                    _signal.signal(sig, old)

        return guard()

    def _check_exit_signal(self):
        """Called at step/epoch boundaries (state guaranteed whole):
        checkpoint and exit if a SIGTERM/SIGINT was deferred."""
        sig = getattr(self, "_exit_signal", None)
        if sig is not None:
            printM(f"signal {sig}: saving checkpoint @ step "
                   f"{int(self.state.step)} before exit")
            self.ckpt.save(int(self.state.step), self.state, force=True)
            raise SystemExit(128 + sig)

    def _train_epochs(self, start_epoch: int, epochs: int):
        for epoch in range(start_epoch, epochs):
            train_loss = self.iter_one_epoch(epoch)
            self._check_exit_signal()
            if (epoch + 1) % self.cfg.eval.interval == 0:
                val_loss = self.validate()
                printM(f"epoch {epoch}: val_loss={val_loss:.5f}")
                self.file_log.log(f"epoch {epoch}: val_loss={val_loss:.5f}")
                self.tb.add_scalar("val/loss", val_loss, int(self.state.step))
                if (self.family in ("heatmap", "simcc", "bottom_up")
                        and self.cfg.eval.run_metrics):
                    metrics = self.evaluate()
                    self.file_log.log(
                        f"epoch {epoch}: "
                        + " ".join(f"{k}={v:.4f}" for k, v in metrics.items()))
                    self.tb.add_scalars(metrics, int(self.state.step),
                                        prefix="eval/")
            self.ckpt.save(int(self.state.step), self.state, metric=train_loss,
                           epoch=epoch)
        self.ckpt.save(int(self.state.step), self.state, force=True)
        self.tb.close()
        printS("training complete")

    # ------------------------------------------------------------------
    def save_checkpoint(self, metric: float | None = None):
        self.ckpt.save(int(self.state.step), self.state, metric=metric, force=True)

    def load_checkpoint(self, path: str | None = None):
        best = bool(path) and path.endswith("@best")
        dirpath = path[: -len("@best")] if best else path
        if dirpath:
            if not os.path.isdir(dirpath):
                # an explicitly configured checkpoint that doesn't exist
                # is an error — silently falling back to the experiment's
                # own ckpt dir would eval different (or random) weights
                raise FileNotFoundError(
                    f"model.checkpoint points at {dirpath!r}, which is "
                    f"not a directory")
            from tpupose.engine.checkpoint import restore_path

            self.state, step = restore_path(self.state, path)
        else:
            self.state, step = self.ckpt.restore(self.state, best=best)
        return step
