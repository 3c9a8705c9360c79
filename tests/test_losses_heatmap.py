import jax.numpy as jnp
import numpy as np

from tpupose.losses.heatmap import joints_mse_loss


def test_zero_loss_on_perfect_prediction():
    t = jnp.ones((2, 8, 6, 3))
    w = jnp.ones((2, 3))
    assert float(joints_mse_loss(t, t, w)) == 0.0


def test_masked_joint_excluded():
    pred = jnp.zeros((1, 4, 4, 2))
    target = jnp.zeros((1, 4, 4, 2)).at[:, :, :, 1].set(1.0)
    w_on = jnp.ones((1, 2))
    w_off = jnp.array([[1.0, 0.0]])
    assert float(joints_mse_loss(pred, target, w_off)) == 0.0
    assert float(joints_mse_loss(pred, target, w_on)) > 0.0


def test_hand_computed_value():
    # single joint, all pixels off by 1 -> 0.5 * 1 = 0.5
    pred = jnp.zeros((1, 2, 2, 1))
    target = jnp.ones((1, 2, 2, 1))
    w = jnp.ones((1, 1))
    np.testing.assert_allclose(float(joints_mse_loss(pred, target, w)), 0.5, atol=1e-6)


def test_layout_agnostic():
    rng = np.random.RandomState(0)
    p = rng.uniform(size=(2, 8, 6, 5)).astype(np.float32)   # NHWK
    t = rng.uniform(size=(2, 8, 6, 5)).astype(np.float32)
    w = np.ones((2, 5), np.float32)
    a = float(joints_mse_loss(jnp.asarray(p), jnp.asarray(t), jnp.asarray(w)))
    pk = jnp.transpose(jnp.asarray(p), (0, 3, 1, 2))        # NKHW
    tk = jnp.transpose(jnp.asarray(t), (0, 3, 1, 2))
    b = float(joints_mse_loss(pk, tk, jnp.asarray(w)))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_joints_mse_weighted():
    """Heatmap-weighting loss (arXiv:2205.10611): zero at the optimum,
    and the same pixel error costs (1 + w*t) times more at the Gaussian
    peak than on background."""
    import jax.numpy as jnp

    from tpupose.losses.heatmap import (joints_mse_loss,
                                        joints_mse_weighted_loss)

    B, H, W, K = 1, 8, 8, 1
    target = np.zeros((B, H, W, K), np.float32)
    target[0, 4, 4, 0] = 1.0
    tw = np.ones((B, K), np.float32)

    assert float(joints_mse_weighted_loss(
        jnp.asarray(target), jnp.asarray(target), jnp.asarray(tw))) == 0.0

    peak_err = target.copy(); peak_err[0, 4, 4, 0] = 0.5      # err at peak
    bg_err = target.copy(); bg_err[0, 0, 0, 0] = 0.5          # same err on bg
    lp = float(joints_mse_weighted_loss(jnp.asarray(peak_err),
                                        jnp.asarray(target), jnp.asarray(tw),
                                        peak_weight=9.0))
    lb = float(joints_mse_weighted_loss(jnp.asarray(bg_err),
                                        jnp.asarray(target), jnp.asarray(tw),
                                        peak_weight=9.0))
    np.testing.assert_allclose(lp / lb, 10.0, rtol=1e-5)      # 1 + 9*1
    # plain MSE treats them identically
    l0p = float(joints_mse_loss(jnp.asarray(peak_err), jnp.asarray(target),
                                jnp.asarray(tw)))
    l0b = float(joints_mse_loss(jnp.asarray(bg_err), jnp.asarray(target),
                                jnp.asarray(tw)))
    np.testing.assert_allclose(l0p, l0b, rtol=1e-6)
