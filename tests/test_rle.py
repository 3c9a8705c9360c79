"""RLE regression family (losses/rle.py + DeepPose(rle=True)): flow
correctness at init, hand-computed NLL, train-step learning smoke, and
Trainer wiring."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_realnvp_identity_at_init():
    """Couplings have zero-init scale/shift heads, so the flow is the
    identity at init and log_prob equals the standard 2D normal."""
    from tpupose.losses.rle import RealNVP

    flow = RealNVP(layers=3)
    r = jnp.asarray(np.random.RandomState(0).randn(16, 2), jnp.float32)
    v = flow.init(jax.random.PRNGKey(0), r)
    lp = flow.apply(v, r)
    want = -0.5 * np.sum(np.asarray(r) ** 2, -1) - math.log(2 * math.pi)
    np.testing.assert_allclose(np.asarray(lp), want, atol=1e-5)


def test_realnvp_is_normalized_after_perturbation():
    """With random (non-identity) params the density still integrates
    to ~1 over a grid: the log-det accounting is exact."""
    from tpupose.losses.rle import RealNVP

    flow = RealNVP(layers=3, hidden=16)
    v = flow.init(jax.random.PRNGKey(0), jnp.zeros((1, 2)))
    # perturb params away from identity
    v = jax.tree_util.tree_map(
        lambda x: x + 0.3 * jax.random.normal(jax.random.PRNGKey(1), x.shape),
        v)
    lim, n = 6.0, 121
    g = np.linspace(-lim, lim, n)
    xx, yy = np.meshgrid(g, g)
    pts = jnp.asarray(np.stack([xx.ravel(), yy.ravel()], -1), jnp.float32)
    p = np.exp(np.asarray(flow.apply(v, pts)))
    mass = p.sum() * (2 * lim / (n - 1)) ** 2
    assert 0.97 < mass < 1.03


def test_rle_loss_hand_computed():
    """residual=False + identity flow: nll = sum log sigma - log N(err)."""
    from tpupose.losses.rle import rle_loss

    mu = jnp.zeros((1, 1, 2))
    sigma = jnp.full((1, 1, 2), 0.5)
    target = jnp.asarray([[[0.25, -0.25]]])
    err = np.array([0.5, -0.5])
    log_phi = jnp.asarray([[-0.5 * np.sum(err ** 2) - math.log(2 * math.pi)]],
                          jnp.float32)
    got = float(rle_loss(mu, sigma, log_phi, target, residual=False))
    want = 2 * math.log(0.5) - float(log_phi[0, 0])
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # laplace residual term adds log(2 sigma) + |err| per dim
    got_r = float(rle_loss(mu, sigma, log_phi, target, residual=True))
    want_r = want + 2 * (math.log(1.0) + 0.5)
    np.testing.assert_allclose(got_r, want_r, rtol=1e-5)
    # visibility zero masks the joint entirely
    vis = jnp.zeros((1, 1))
    assert float(rle_loss(mu, sigma, log_phi, target, vis)) == 0.0


@pytest.mark.slow
def test_rle_train_step_learns():
    """A few steps on a fixed batch: NLL decreases and mu moves toward the
    target."""
    import optax

    from tpupose.engine.train_state import (create_train_state,
                                            make_rle_train_step)
    from tpupose.losses.rle import rle_loss
    from tpupose.models.deeppose import DeepPose

    m = DeepPose(backbone="resnet18", num_keypoints=3, rle=True,
                 dtype=jnp.float32)
    rng = np.random.RandomState(0)
    batch = {
        "images": rng.randint(0, 255, (4, 32, 32, 3)).astype(np.uint8),
        "target_coords": jnp.asarray(rng.uniform(0.2, 0.8, (4, 3, 2)),
                                     jnp.float32),
        "visibility": jnp.ones((4, 3)),
    }
    # tight clipping: the RLE NLL is sharp around init (grad norms ~50),
    # so the un-clipped first steps can climb before descending
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    state = create_train_state(m, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)), tx)
    step = make_rle_train_step(rle_loss)
    losses = []
    for _ in range(30):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0] - 1.0


@pytest.mark.slow
def test_rle_trainer_wiring(tmp_path):
    from tpupose.configs.default import default_config
    from tpupose.engine.trainer import Trainer

    cfg = default_config()
    cfg.model.name = "deeppose"
    cfg.model.backbone = "resnet18"
    cfg.model.num_keypoints = 4
    cfg.model.heatmap_size = (16, 16)
    cfg.model.freeze_backbone = False
    cfg.data.name = "synthetic"
    cfg.data.image_size = (64, 64)
    cfg.train.batch_size = 16
    cfg.train.warmup_epochs = 0
    cfg.train.mixed_precision = False
    cfg.train.log_interval = 100
    cfg.train.output_dir = str(tmp_path)
    cfg.loss.name = "rle"
    cfg.optimizer.name = "adam"
    cfg.optimizer.lr = 1e-3
    cfg.train.grad_clip_norm = 1.0  # sharp NLL at init; see probe above

    tr = Trainer(cfg)
    assert tr.family == "rle"
    # wiring, not convergence: with a fresh batch every step the RLE NLL
    # climbs for the first epochs while sigma calibrates (the fixed-batch
    # descent is proven in test_rle_train_step_learns above) — assert the
    # end-to-end loop runs and stays finite across train + validate
    l0 = tr.iter_one_epoch(0)
    assert np.isfinite(l0)
    v = tr.validate()
    assert np.isfinite(v)
