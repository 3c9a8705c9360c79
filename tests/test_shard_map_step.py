"""shard_map+psum DP step == jit-sharding DP step == single-device step
(for a BN-free model, where both parallel forms are exact)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

import flax.linen as nn

from tpupose.parallel.mesh import create_mesh
from tpupose.parallel.shard_map_step import make_shard_map_train_step


class TinyNet(nn.Module):
    """BN-free conv head (LayerNorm), valid under shard_map."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(16, (3, 3), padding=1, dtype=jnp.float32)(x)
        x = nn.LayerNorm(dtype=jnp.float32)(x)
        x = nn.relu(x)
        return nn.Conv(4, (1, 1), dtype=jnp.float32)(x)


def test_shard_map_matches_single_device():
    mesh = create_mesh(data=8, model=1)
    net = TinyNet()
    rng = np.random.RandomState(0)
    images = rng.rand(16, 8, 8, 3).astype(np.float32)
    target = rng.rand(16, 8, 8, 4).astype(np.float32)
    tw = np.ones((16, 4), np.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(images[:1]))["params"]
    tx = optax.sgd(1e-2)
    opt = tx.init(params)

    def apply_fn(p, x):
        return net.apply({"params": p}, x)

    def loss_fn(preds, t, w):
        return jnp.mean((preds - t) ** 2)

    # single device reference
    def single(params, opt, images, target, tw):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(apply_fn(p, images), target, tw))(params)
        upd, new_opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), new_opt, loss

    p1, _, l1 = jax.jit(single)(params, opt, images, target, tw)

    # shard_map
    step = make_shard_map_train_step(mesh, apply_fn, loss_fn, tx)
    put = lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec))
    p2, _, l2 = step(
        jax.tree_util.tree_map(lambda x: put(x, P()), params),
        jax.tree_util.tree_map(lambda x: put(x, P()) if hasattr(x, "shape") else x, opt),
        put(images, P("data")), put(target, P("data")), put(tw, P("data")))

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)
