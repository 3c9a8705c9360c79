"""Train state + jitted DP train/eval steps.

The reference's Trainer hot loop (pose/pose/engine/trainer.py:47-81:
to(device)/255 -> autocast forward -> loss -> scale/backward -> unscale ->
clip -> step) becomes ONE compiled XLA program: normalize, forward, loss,
grads, clip, optimizer update, BN-stat update — fused and overlap-scheduled
by XLA. DP happens because the batch is sharded on the mesh 'data' axis
while params are replicated: XLA inserts the gradient all-reduce (the DDP
hook) automatically. bf16 compute replaces AMP; no GradScaler is needed
because bf16 has fp32-range exponents.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # Exponential moving average of params (None = disabled). Standard
    # modern-pose-training technique (the reference has no analog): the
    # smoothed weights are what evaluation/serving should use. Lives in
    # the SAME compiled update (one fused lerp over the param tree), so
    # the cost is one extra HBM read/write of the params per step.
    ema_params: Any = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        ema = self.ema_params
        if ema is not None and self.ema_decay > 0:
            # warmup: effective decay ramps in as min(d, (1+t)/(10+t)) so
            # early EMA tracks the fast-moving init instead of noise
            t = self.step.astype(jnp.float32)
            d = jnp.minimum(self.ema_decay, (1.0 + t) / (10.0 + t))
            ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                ema, params)
        return self.replace(
            step=self.step + 1,
            params=params,
            opt_state=new_opt,
            batch_stats=new_batch_stats if new_batch_stats is not None else self.batch_stats,
            ema_params=ema,
        )

    @property
    def eval_params(self):
        """Params evaluation/serving should use: the EMA when tracked."""
        return self.ema_params if self.ema_params is not None else self.params

    def for_eval(self) -> "TrainState":
        """A state whose .params are the eval (EMA) weights — hand this
        to evaluators/predictors, which read state.params."""
        if self.ema_params is None:
            return self
        return self.replace(params=self.ema_params, ema_params=None)


def create_train_state(model, rng, sample_input, tx, train: bool = False,
                       ema_decay: float = 0.0) -> TrainState:
    """Initialize params/batch_stats and the optimizer state.

    ema_decay > 0 additionally tracks an exponential moving average of the
    params (initialized to a copy), updated inside apply_gradients."""
    variables = model.init(rng, sample_input, train=train)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    ema = (jax.tree_util.tree_map(jnp.array, params)
           if ema_decay > 0 else None)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
        ema_params=ema,
        ema_decay=float(ema_decay),
    )


def make_heatmap_train_step(loss_fn, color_jitter_strength: float = 0.0,
                            jitter_seed: int = 0, heatmap_size=None,
                            sigma: float = 2.0,
                            affine_rotation: float = 0.0,
                            affine_scale: float = 0.0,
                            udp: bool = False,
                            teacher_apply=None,
                            distill_weight: float = 0.5):
    """Build the jitted train step for heatmap models.

    batch: {"images": uint8/float NHWC} plus EITHER precomputed
    {"target": (B,Hh,Wh,K), "target_weight": (B,K)} OR raw
    {"joints": (B,K,2) heatmap px, "visibility": (B,K)} — with
    heatmap_size set, the Gaussian targets are rendered INSIDE the
    compiled step (fused with the forward; the host ships only the tiny
    joint arrays). Donates the state buffer.

    color_jitter_strength > 0 applies the on-device color jitter INSIDE the
    compiled step (north-star "fused XLA image kernels": brightness/
    contrast/saturation fuse into the normalize + first conv, zero extra
    HBM round-trips). Labels are geometric — jitter never touches them.
    affine_rotation/affine_scale > 0 additionally run the random
    rotation/scale augmentation as a batched on-device warp
    (ops/affine.random_affine_augment), transforming the joint labels in
    lockstep BEFORE the in-step Gaussian render. All aug rngs are folded
    from the step counter: deterministic resume.

    teacher_apply: heatmap knowledge distillation (FPD, "Fast Human Pose
    Estimation", Zhang et al. CVPR 2019 — no reference-repo counterpart).
    A frozen teacher's eval-mode forward runs INSIDE the same compiled
    step on the identical (augmented) images, and the loss becomes
    (1-w)·task + w·MSE(student_hm, teacher_hm) with w=distill_weight.
    The returned step then takes a third argument, the teacher's
    variables dict — passed per-call so the teacher's weights are mesh
    arrays, not baked-in jit constants.
    """
    import jax.numpy as _jnp

    from tpupose.ops.affine import random_affine_augment
    from tpupose.ops.heatmap import gaussian_heatmaps
    from tpupose.ops.preprocess import (IMAGENET_MEAN, IMAGENET_STD,
                                        color_jitter, normalize_images)

    use_affine = (affine_rotation > 0 or affine_scale > 0)

    def train_step(state: TrainState, batch, teacher_vars=None):
        if use_affine and "target" in batch:
            raise ValueError("device affine augmentation needs raw "
                             "joints, not precomputed targets")
        rng = jax.random.fold_in(jax.random.PRNGKey(jitter_seed), state.step)
        rng_aff, rng_jit = jax.random.split(rng)
        images = batch["images"]
        if use_affine:
            assert heatmap_size is not None, "device affine needs heatmap_size"
            batch = dict(batch)
            images, batch["joints"], batch["visibility"] = \
                random_affine_augment(
                    images, batch["joints"], batch["visibility"], rng_aff,
                    affine_rotation, affine_scale, tuple(heatmap_size),
                    udp=udp)
        if color_jitter_strength > 0:
            x = images.astype(_jnp.float32) * (1.0 / 255.0)
            x = color_jitter(x, rng_jit, color_jitter_strength)
            m = _jnp.asarray(IMAGENET_MEAN)
            s = _jnp.asarray(IMAGENET_STD)
            imgs = ((x - m) / s).astype(_jnp.bfloat16)
        else:
            imgs = normalize_images(images)
        if "target" in batch:
            batch = dict(batch)
        else:
            assert heatmap_size is not None, "need heatmap_size to render targets"
            t, tw = gaussian_heatmaps(batch["joints"], batch["visibility"],
                                      tuple(heatmap_size), sigma)
            batch = dict(batch)
            batch["target"] = _jnp.transpose(t, (0, 2, 3, 1))  # NKHW -> NHWK
            batch["target_weight"] = tw

        if teacher_apply is not None:
            from tpupose.losses.heatmap import joints_mse_loss

            # frozen teacher, eval mode, same (augmented) pixels
            t_hm = jax.lax.stop_gradient(
                teacher_apply(teacher_vars, imgs, train=False))

        def compute_loss(params):
            outs, mut = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                imgs, train=True, mutable=["batch_stats"],
            )
            task = loss_fn(outs, batch["target"], batch.get("target_weight"))
            if teacher_apply is None:
                return task, (mut.get("batch_stats", state.batch_stats),
                              task, task * 0.0)
            kd = joints_mse_loss(outs, t_hm, batch.get("target_weight"))
            loss = (1.0 - distill_weight) * task + distill_weight * kd
            return loss, (mut.get("batch_stats", state.batch_stats),
                          task, kd)

        (loss, (new_bs, task, kd)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        if teacher_apply is not None:
            metrics["task_loss"] = task
            metrics["kd_loss"] = kd
        return new_state, metrics

    if teacher_apply is None:
        jitted = jax.jit(lambda s, b: train_step(s, b), donate_argnums=(0,))
        return jitted
    return jax.jit(train_step, donate_argnums=(0,))


def make_simcc_train_step(loss_fn, bins_hw, sigma: float = 6.0,
                          color_jitter_strength: float = 0.0,
                          jitter_seed: int = 0,
                          affine_rotation: float = 0.0,
                          affine_scale: float = 0.0,
                          udp: bool = False):
    """Train step for SimCC coordinate-classification models
    (models/simcc.py). batch: {"images" uint8 NHWC, "joints" (B,K,2) in
    BIN coordinates, "visibility" (B,K)}. The 1D Gaussian bin targets are
    rendered inside the compiled step; optional on-device color jitter and
    rotation/scale warp run exactly as in the heatmap step (joints live on
    the bin grid, which the affine op treats as its target frame)."""
    import jax.numpy as _jnp

    from tpupose.losses.simcc import gaussian_1d_targets
    from tpupose.ops.affine import random_affine_augment
    from tpupose.ops.preprocess import (IMAGENET_MEAN, IMAGENET_STD,
                                        color_jitter, normalize_images)

    bins_hw = tuple(bins_hw)
    use_affine = (affine_rotation > 0 or affine_scale > 0)

    def train_step(state: TrainState, batch):
        rng = jax.random.fold_in(jax.random.PRNGKey(jitter_seed), state.step)
        rng_aff, rng_jit = jax.random.split(rng)
        images = batch["images"]
        joints, vis = batch["joints"], batch["visibility"]
        if use_affine:
            images, joints, vis = random_affine_augment(
                images, joints, vis, rng_aff,
                affine_rotation, affine_scale, bins_hw, udp=udp)
        if color_jitter_strength > 0:
            x = images.astype(_jnp.float32) * (1.0 / 255.0)
            x = color_jitter(x, rng_jit, color_jitter_strength)
            m = _jnp.asarray(IMAGENET_MEAN)
            s = _jnp.asarray(IMAGENET_STD)
            imgs = ((x - m) / s).astype(_jnp.bfloat16)
        else:
            imgs = normalize_images(images)
        tx, ty, tw = gaussian_1d_targets(joints, vis, bins_hw, sigma)

        def compute_loss(params):
            preds, mut = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                imgs, train=True, mutable=["batch_stats"],
            )
            loss = loss_fn(preds, (tx, ty), tw)
            return loss, mut.get("batch_stats", state.batch_stats)

        (loss, new_bs), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return jax.jit(train_step, donate_argnums=(0,))


def make_regression_train_step(loss_fn):
    """Train step for coordinate-regression models (DeepPose).

    batch: {"images": uint8 NHWC, "target_coords": (B, K, 2) normalized,
            "visibility": (B, K)}.
    """
    from tpupose.ops.preprocess import normalize_images

    def train_step(state: TrainState, batch):
        imgs = normalize_images(batch["images"])

        def compute_loss(params):
            preds, mut = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                imgs, train=True, mutable=["batch_stats"],
            )
            loss = loss_fn(preds, batch["target_coords"],
                           batch.get("visibility"))
            return loss, mut.get("batch_stats", state.batch_stats)

        (loss, new_bs), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return jax.jit(train_step, donate_argnums=(0,))


def make_bottom_up_train_step(loss_fn):
    """Train step for the bottom-up AE family (models/bottom_up.py).

    batch: {"images": uint8 NHWC, "keypoints": (B, M, K, 3) normalized,
            "instance_mask": (B, M)} — the same padded multi-instance
    contract as the yolo family. Targets (multi-person Gaussians) and the
    tag push/pull terms render inside the jitted step (losses/ae.ae_loss).
    """
    from tpupose.ops.preprocess import normalize_images

    def train_step(state: TrainState, batch):
        imgs = normalize_images(batch["images"])

        def compute_loss(params):
            pred, mut = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                imgs, train=True, mutable=["batch_stats"],
            )
            loss, parts = loss_fn(pred, batch["keypoints"],
                                  batch["instance_mask"])
            return loss, (mut.get("batch_stats", state.batch_stats), parts)

        (loss, (new_bs, parts)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        metrics.update(parts)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def make_rle_train_step(loss_fn):
    """Train step for RLE coordinate regression (DeepPose(rle=True)).

    batch: {"images": uint8 NHWC, "target_coords": (B, K, 2) normalized,
            "visibility": (B, K)}. The model apply takes the target and
    returns (mu, sigma, log_phi); loss_fn is losses/rle.rle_loss (already
    bound to residual/q) — the flow NLL backprops into the flow params,
    the head, and the backbone in one program.
    """
    from tpupose.ops.preprocess import normalize_images

    def train_step(state: TrainState, batch):
        imgs = normalize_images(batch["images"])

        def compute_loss(params):
            (mu, sigma, log_phi), mut = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                imgs, train=True, target=batch["target_coords"],
                mutable=["batch_stats"],
            )
            loss = loss_fn(mu, sigma, log_phi, batch["target_coords"],
                           batch.get("visibility"))
            return loss, mut.get("batch_stats", state.batch_stats)

        (loss, new_bs), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return jax.jit(train_step, donate_argnums=(0,))


def make_yolo_train_step(loss_fn, mosaic_prob: float = 0.0,
                         mosaic_seed: int = 0):
    """Jitted train step for single-stage YOLO-pose models.

    batch: {"images": uint8 NHWC, "boxes": (B,M,4), "classes": (B,M),
            "keypoints": (B,M,K,3), "instance_mask": (B,M)}.
    loss_fn: (per-scale raw preds, targets) -> (total, parts)
    (ComputeLoss or v8PoseLoss). The reference's /255-only preprocessing
    (pose trainer :54-56) is preserved via scale_only.

    mosaic_prob > 0: the 4-image mosaic (ops/mosaic.py) runs INSIDE the
    compiled step per image with this probability, labels transformed in
    lockstep; rng folded from the step counter (deterministic resume).
    """
    from tpupose.ops.mosaic import mosaic_augment_normalized
    from tpupose.ops.preprocess import normalize_images

    def train_step(state: TrainState, batch):
        images = batch["images"]
        targets = {k: batch[k] for k in
                   ("boxes", "classes", "keypoints", "instance_mask")}
        extra = {}
        if mosaic_prob > 0:
            rng = jax.random.fold_in(jax.random.PRNGKey(mosaic_seed),
                                     state.step)
            # the *_normalized wrapper handles the convention boundary:
            # the yolo batch carries normalized cxcywh boxes + normalized
            # keypoints (data/yolo_pose.py), mosaic works in pixel xyxy
            (images, targets["boxes"], targets["classes"],
             targets["keypoints"], targets["instance_mask"],
             extra["mosaic_dropped"]) = mosaic_augment_normalized(
                images, targets["boxes"], targets["classes"],
                targets["keypoints"], targets["instance_mask"], rng,
                prob=mosaic_prob)
        imgs = normalize_images(images, scale_only=True)

        def compute_loss(params):
            preds, mut = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                imgs, train=True, mutable=["batch_stats"],
            )
            total, parts = loss_fn(preds, targets)
            return total, (mut.get("batch_stats", state.batch_stats), parts)

        (loss, (new_bs, parts)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        metrics.update({f"loss_{k}": v for k, v in parts.items()})
        metrics.update(extra)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def make_heatmap_eval_step():
    """Forward-only step returning heatmaps (NHWK)."""

    from tpupose.ops.preprocess import normalize_images

    def eval_step(state: TrainState, images):
        imgs = normalize_images(images)
        return state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            imgs, train=False,
        )

    return jax.jit(eval_step)
