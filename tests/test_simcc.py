"""SimCC coordinate-classification family (models/simcc.py, losses/simcc.py,
ops/decode.decode_simcc): targets, decode oracle, model shapes, training
descent + localization, and the fused evaluator path."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


def test_gaussian_1d_targets():
    from tpupose.losses.simcc import gaussian_1d_targets

    joints = np.array([[[10.0, 20.0], [47.0, 63.0], [-12.0, 3.0],
                        [-2.0, 3.0]]], np.float32)     # (1, 4, 2) bin coords
    vis = np.array([[1.0, 1.0, 1.0, 1.0]], np.float32)
    tx, ty, w = jax.device_get(gaussian_1d_targets(
        jnp.asarray(joints), jnp.asarray(vis), (64, 48), sigma=2.0))
    assert tx.shape == (1, 4, 48) and ty.shape == (1, 4, 64)
    # distributions sum to 1 and peak at the joint bin
    np.testing.assert_allclose(tx.sum(-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(ty.sum(-1), 1.0, atol=1e-5)
    assert tx[0, 0].argmax() == 10 and ty[0, 0].argmax() == 20
    assert tx[0, 1].argmax() == 47 and ty[0, 1].argmax() == 63
    # >3-sigma outside -> weight 0; border joints (within 3*sigma, mass
    # still on the grid — the heatmap family's rule) keep training signal
    np.testing.assert_array_equal(w, [[1.0, 1.0, 0.0, 1.0]])


def test_simcc_kl_loss_minimized_at_target():
    """Soft CE is minimized when predicted distribution == target."""
    from tpupose.losses.simcc import gaussian_1d_targets, simcc_kl_loss

    rng = np.random.RandomState(0)
    joints = rng.uniform(5, 40, (2, 4, 2)).astype(np.float32)
    vis = np.ones((2, 4), np.float32)
    tx, ty, w = gaussian_1d_targets(jnp.asarray(joints), jnp.asarray(vis),
                                    (64, 48), sigma=2.0)
    # logits = log target reproduce the target after softmax
    perfect = (jnp.log(tx + 1e-12), jnp.log(ty + 1e-12))
    rand = (jnp.asarray(rng.randn(2, 4, 48), jnp.float32),
            jnp.asarray(rng.randn(2, 4, 64), jnp.float32))
    l_perfect = float(simcc_kl_loss(perfect, (tx, ty), w))
    l_rand = float(simcc_kl_loss(rand, (tx, ty), w))
    assert l_perfect < l_rand
    # zero weight -> zero-ish contribution change
    w0 = w.at[:, 0].set(0.0)
    assert np.isfinite(float(simcc_kl_loss(rand, (tx, ty), w0)))


def test_decode_simcc_oracle():
    from tpupose.ops.decode import decode_simcc

    # plant 1D Gaussians at known fractional centers; parabolic refinement
    # on log-probs of a sampled Gaussian recovers the center to < 0.05 bins
    centers_x = np.array([[10.3, 30.8]], np.float32)
    centers_y = np.array([[5.5, 40.2]], np.float32)
    gx = np.arange(48, dtype=np.float32)
    gy = np.arange(64, dtype=np.float32)
    sigma = 3.0
    xl = -0.5 * ((gx[None, None] - centers_x[..., None]) / sigma) ** 2
    yl = -0.5 * ((gy[None, None] - centers_y[..., None]) / sigma) ** 2
    coords, scores = jax.device_get(decode_simcc(
        jnp.asarray(10 * xl), jnp.asarray(10 * yl)))
    np.testing.assert_allclose(coords[0, :, 0], centers_x[0], atol=0.05)
    np.testing.assert_allclose(coords[0, :, 1], centers_y[0], atol=0.05)
    assert (scores > 0).all() and (scores <= 1.0).all()

    # argmax-only fallback: integer bins
    coords2, _ = jax.device_get(decode_simcc(
        jnp.asarray(10 * xl), jnp.asarray(10 * yl), refine=False))
    np.testing.assert_allclose(coords2[0, :, 0], np.round(centers_x[0]),
                               atol=0.5)


def test_simcc_flip_back():
    from tpupose.ops.decode import simcc_flip_back

    xl = jnp.asarray(np.random.RandomState(0).randn(2, 4, 48)
                     .astype(np.float32))
    yl = jnp.asarray(np.random.RandomState(1).randn(2, 4, 64)
                     .astype(np.float32))
    pairs = np.array([(1, 2)])
    xb, yb = jax.device_get(simcc_flip_back(xl, yl, pairs))
    # x bins reversed, channels 1/2 swapped
    np.testing.assert_allclose(xb[:, 0], np.asarray(xl)[:, 0, ::-1])
    np.testing.assert_allclose(xb[:, 1], np.asarray(xl)[:, 2, ::-1])
    np.testing.assert_allclose(yb[:, 1], np.asarray(yl)[:, 2])
    np.testing.assert_allclose(yb[:, 3], np.asarray(yl)[:, 3])


def test_simcc_flip_back_equivariance_no_bias():
    """A flip-equivariant model on a pixel-mirrored crop (p -> W-1-p, the
    evaluator's x[:, :, ::-1]) emits x-bin mass at u_f = r*(W-1) - u under
    the u = r*p crop->bin convention. flip_back with shift_bins = r-1 must
    decode to EXACTLY the direct coordinate — plain reversal would be
    biased by +(r-1) bins (+0.5 px at r=2)."""
    from tpupose.ops.decode import decode_simcc, simcc_flip_back

    W, r = 48, 2
    Wb = W * r
    u = np.array([[20.0, 37.5, 61.0]], np.float32)       # direct x bins
    u_f = r * (W - 1) - u                                 # flipped-crop bins
    g = np.arange(Wb, dtype=np.float32)
    sigma = 3.0
    xl_f = 10 * np.exp(-0.5 * ((g[None, None] - u_f[..., None]) / sigma) ** 2)
    yl_f = 10 * np.exp(-0.5 * ((g[None, None] - 50.0) / sigma) ** 2)
    xb, yb = simcc_flip_back(jnp.asarray(xl_f), jnp.asarray(yl_f),
                             np.zeros((0, 2), np.int64), shift_bins=r - 1)
    coords, _ = jax.device_get(decode_simcc(xb, yb))
    np.testing.assert_allclose(coords[0, :, 0], u[0], atol=0.05)
    # and WITHOUT the shift the decode is off by exactly r-1 = 1 bin
    xb0, yb0 = simcc_flip_back(jnp.asarray(xl_f), jnp.asarray(yl_f),
                               np.zeros((0, 2), np.int64))
    coords0, _ = jax.device_get(decode_simcc(xb0, yb0))
    np.testing.assert_allclose(coords0[0, :, 0], u[0] + (r - 1), atol=0.05)


@pytest.fixture(scope="module")
def tiny_simcc():
    from tpupose.engine.train_state import create_train_state
    from tpupose.models.simcc import SimCCPose

    model = SimCCPose(backbone="resnet18", num_keypoints=4,
                      split_ratio=2.0, dtype=jnp.float32)
    tx = optax.adam(1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), tx)
    return model, state


def test_simcc_model_shapes(tiny_simcc):
    model, state = tiny_simcc
    x = jnp.zeros((2, 64, 64, 3))
    xl, yl = model.apply({"params": state.params,
                          "batch_stats": state.batch_stats}, x, train=False)
    assert xl.shape == (2, 4, 128) and yl.shape == (2, 4, 128)
    assert xl.dtype == jnp.float32


@pytest.mark.slow
def test_simcc_train_step_descends_and_localizes():
    """Train a tiny SimCC on one fixed batch: loss drops toward the target
    distribution's entropy floor AND the decoded argmax lands near the
    planted joints (bins are directly supervised — no MSE-heatmap
    predict-zero plateau). 64-bin grid (split_ratio=1), 200 steps."""
    from tpupose.engine.train_state import (create_train_state,
                                            make_simcc_train_step)
    from tpupose.losses.simcc import simcc_kl_loss
    from tpupose.models.simcc import SimCCPose
    from tpupose.ops.decode import decode_simcc

    model = SimCCPose(backbone="resnet18", num_keypoints=4,
                      split_ratio=1.0, dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), optax.adam(1e-2))
    rng = np.random.RandomState(0)
    B, K = 8, 4
    batch = {
        "images": jnp.asarray(rng.randint(0, 255, (B, 64, 64, 3))
                              .astype(np.uint8)),
        "joints": jnp.asarray(rng.uniform(5, 59, (B, K, 2))
                              .astype(np.float32)),
        "visibility": jnp.ones((B, K), jnp.float32),
    }
    step = make_simcc_train_step(simcc_kl_loss, bins_hw=(64, 64), sigma=3.0)
    losses = []
    for _ in range(220):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    # entropy floor of the sigma=3 targets is ~4 nats; from ~9.6 at init,
    # 220 steps at lr 1e-2 measured 5.7 and err ~1.4 bins (see commit)
    assert losses[-1] < 6.5, (losses[0], losses[-1])

    from tpupose.ops.preprocess import normalize_images

    xl, yl = model.apply({"params": state.params,
                          "batch_stats": state.batch_stats},
                         normalize_images(batch["images"]), train=False)
    coords, _ = jax.device_get(decode_simcc(xl, yl))
    err = np.abs(coords - np.asarray(batch["joints"])).mean()
    assert err < 3.0, f"mean |err| {err:.1f} bins"  # 64-bin grid, chance ~21


def test_simcc_evaluator_perfect_logits():
    """Fused evaluator path (family='simcc'): a stub state that emits
    Gaussian logits centered on known bin coords decodes + back-projects
    to the exact source points, with flip-test on."""
    from typing import Any, Callable

    from flax import struct

    from tpupose.engine.evaluator import TopDownEvaluator
    from tpupose.ops.affine import get_affine_matrix, affine_transform_points

    B, K, Hb, Wb = 2, 3, 128, 128
    rng = np.random.RandomState(0)
    joints_bins = rng.uniform(20, 100, (B, K, 2)).astype(np.float32)
    gx = np.arange(Wb, dtype=np.float32)
    gy = np.arange(Hb, dtype=np.float32)
    xl0 = 20 * np.exp(-0.5 * ((gx[None, None] - joints_bins[..., 0:1]) / 3) ** 2)
    yl0 = 20 * np.exp(-0.5 * ((gy[None, None] - joints_bins[..., 1:2]) / 3) ** 2)

    # what a flip-EQUIVARIANT model emits on the mirrored crop: Gaussians
    # at u_f = r*(W-1) - u (u = r*p convention; r = Wb/W = 2 here), NOT the
    # reversed array (which differs by the r-1 shift flip_back removes)
    r = Wb / 64
    uf = r * (64 - 1) - joints_bins[..., 0:1]
    xlf0 = 20 * np.exp(-0.5 * ((gx[None, None] - uf) / 3) ** 2)

    def apply_fn(variables, x, train=False):
        # detect the flipped forward by comparing against the stored
        # original column order (channels have no left/right pairs here:
        # pairs=[] below)
        is_flip = jnp.allclose(x, apply_fn.x_orig[:, :, ::-1], atol=1e-5)
        xl = jnp.where(is_flip, jnp.asarray(xlf0), jnp.asarray(xl0))
        return xl, jnp.asarray(yl0)

    imgs = rng.randint(0, 255, (B, 64, 64, 3)).astype(np.uint8)
    from tpupose.ops.preprocess import normalize_images
    apply_fn.x_orig = normalize_images(jnp.asarray(imgs))

    @struct.dataclass
    class State:
        params: Any
        batch_stats: Any
        apply_fn: Callable = struct.field(pytree_node=False)

    state = State({}, {}, apply_fn)
    ev = TopDownEvaluator(state, (Hb, Wb), flip_test=True,
                          flip_pairs=np.zeros((0, 2), np.int64),
                          family="simcc")
    centers = np.tile([[32.0, 32.0]], (B, 1)).astype(np.float32)
    scales = np.tile([[64.0, 64.0]], (B, 1)).astype(np.float32)
    src, scores = jax.device_get(ev._step(state, jnp.asarray(imgs),
                                          jnp.asarray(centers),
                                          jnp.asarray(scales)))
    # expected: bin coords mapped through the same affine
    m = get_affine_matrix(jnp.asarray(centers[0]), jnp.asarray(scales[0]),
                          0.0, (Hb, Wb))
    want = jax.device_get(affine_transform_points(
        jnp.asarray(joints_bins), m))
    np.testing.assert_allclose(src, want, atol=0.2)


def test_simcc_builder_and_yaml():
    """Builder wires model/loss; the shipped yaml satisfies the bin-grid
    invariant; a wrong heatmap_size raises."""
    from tpupose.configs import load_config
    from tpupose.engine.builder import Builder
    from tpupose.losses.simcc import simcc_kl_loss
    from tpupose.models.simcc import SimCCPose

    cfg = load_config("tpupose/configs/method/simcc_r50.yaml")
    b = Builder(cfg)
    assert isinstance(b.model(), SimCCPose)
    assert b.loss() is simcc_kl_loss

    cfg2 = load_config("tpupose/configs/method/simcc_r50.yaml")
    cfg2.model.heatmap_size = [64, 48]
    with pytest.raises(ValueError, match="split_ratio"):
        Builder(cfg2).model()
