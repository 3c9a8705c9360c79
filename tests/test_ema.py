"""Model EMA (train.ema_decay): fused in-step update, eval routing via
for_eval(), checkpoint round-trip, and pre-EMA-checkpoint compatibility."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


def _tiny_state(ema_decay=0.999):
    import flax.linen as nn

    from tpupose.engine.train_state import create_train_state

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Dense(2)(x)

    model = M()
    return model, create_train_state(model, jax.random.PRNGKey(0),
                                     jnp.zeros((1, 3)), optax.sgd(0.1),
                                     ema_decay=ema_decay)


def test_ema_tracks_params():
    model, state = _tiny_state(ema_decay=0.9)
    p0 = jax.device_get(state.params)
    # ema initialized to a copy of params
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, p0, jax.device_get(state.ema_params))

    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    for _ in range(5):
        state = state.apply_gradients(grads)
    p = jax.device_get(state.params)["Dense_0"]["kernel"]
    e = jax.device_get(state.ema_params)["Dense_0"]["kernel"]
    k0 = p0["Dense_0"]["kernel"]
    # ema lags params: strictly between the init and the current weights
    assert np.all((e - p) * (k0 - p) > 0), "ema must sit between init and params"
    assert not np.allclose(e, p)

    # warmup: at step 0 the effective decay is (1+0)/(10+0) = 0.1, far
    # below 0.9 — the first ema is 0.1*init + 0.9*new, i.e. tracks fast
    model2, s2 = _tiny_state(ema_decay=0.9)
    s2 = s2.apply_gradients(grads)
    e1 = jax.device_get(s2.ema_params)["Dense_0"]["kernel"]
    p1 = jax.device_get(s2.params)["Dense_0"]["kernel"]
    np.testing.assert_allclose(e1, 0.1 * k0 + 0.9 * p1, rtol=1e-5)


def test_for_eval_swaps_ema_in():
    _, state = _tiny_state(ema_decay=0.9)
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    state = state.apply_gradients(grads)
    ev = state.for_eval()
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           jax.device_get(ev.params),
                           jax.device_get(state.ema_params))
    assert ev.ema_params is None
    # disabled: for_eval is the identity
    _, s0 = _tiny_state(ema_decay=0.0)
    assert s0.for_eval() is s0
    assert s0.ema_params is None


def test_ema_checkpoint_roundtrip(tmp_path):
    from tpupose.engine.checkpoint import CheckpointManager

    _, state = _tiny_state(ema_decay=0.9)
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    for _ in range(3):
        state = state.apply_gradients(grads)

    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(int(state.step), state, force=True)
    mgr.close()

    _, fresh = _tiny_state(ema_decay=0.9)
    mgr2 = CheckpointManager(str(tmp_path / "ck"))
    restored, step = mgr2.restore(fresh)
    mgr2.close()
    assert step == 3
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           jax.device_get(restored.ema_params),
                           jax.device_get(state.ema_params))
    # and the ema differs from the raw params (i.e. it was truly restored,
    # not re-seeded)
    e = jax.device_get(restored.ema_params)["Dense_0"]["kernel"]
    p = jax.device_get(restored.params)["Dense_0"]["kernel"]
    assert not np.allclose(e, p)


def test_ema_restores_pre_ema_checkpoint(tmp_path):
    """An EMA-tracking state restoring a checkpoint written WITHOUT EMA
    seeds the EMA from the restored weights instead of failing."""
    from tpupose.engine.checkpoint import CheckpointManager

    _, plain = _tiny_state(ema_decay=0.0)
    grads = jax.tree_util.tree_map(jnp.ones_like, plain.params)
    plain = plain.apply_gradients(grads)
    mgr = CheckpointManager(str(tmp_path / "ck2"))
    mgr.save(int(plain.step), plain, force=True)
    mgr.close()

    _, tracking = _tiny_state(ema_decay=0.9)
    mgr2 = CheckpointManager(str(tmp_path / "ck2"))
    restored, step = mgr2.restore(tracking)
    mgr2.close()
    assert step == 1
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           jax.device_get(restored.ema_params),
                           jax.device_get(restored.params))


@pytest.mark.slow
def test_trainer_ema_end_to_end():
    """Trainer with train.ema_decay: the fused heatmap train step updates
    the EMA, and validate() runs on the EMA weights."""
    from tpupose.configs import default_config
    from tpupose.engine.trainer import Trainer

    cfg = default_config()
    cfg.model.name = "simple_baseline"
    cfg.model.backbone = "resnet18"
    cfg.model.num_keypoints = 4
    cfg.model.heatmap_size = (16, 16)
    cfg.data.name = "synthetic"
    cfg.data.image_size = (64, 64)
    cfg.data.num_samples = 32
    cfg.train.batch_size = 16
    cfg.train.epochs = 1
    cfg.train.warmup_epochs = 0
    cfg.train.mixed_precision = False
    cfg.train.ema_decay = 0.9
    cfg.train.output_dir = "/tmp/ema_trainer_test"
    cfg.train.tensorboard = False

    tr = Trainer(cfg)
    tr.iter_one_epoch(0)
    assert tr.state.ema_params is not None
    p = jax.device_get(tr.state.params)
    e = jax.device_get(tr.state.ema_params)
    leaves_p = jax.tree_util.tree_leaves(p)
    leaves_e = jax.tree_util.tree_leaves(e)
    assert any(not np.allclose(a, b) for a, b in zip(leaves_p, leaves_e)), \
        "ema should lag the trained params"
    val = tr.validate()
    assert np.isfinite(val)
