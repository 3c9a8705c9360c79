"""Explicit-collective DP train step via shard_map + psum.

The jit-sharding path (engine/train_state.py) lets XLA insert the gradient
all-reduce from annotations. This module is the explicit form — the direct
analog of DDP's bucketed NCCL all-reduce (SURVEY.md §5.8): each device
computes grads on its local shard, `jax.lax.psum` averages them over the
'data' axis (riding ICI), and every replica applies the identical update.

Both forms are numerically equivalent (tests/test_shard_map_step.py);
shard_map is useful when per-device control is needed (loss-scale skipping,
local grad accumulation, custom comms). Note: BatchNorm models need the
jit-sharding path for global (sync) statistics; under shard_map, per-shard
statistics would diverge — use GroupNorm/LayerNorm models here or psum the
stats explicitly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tpupose.parallel.mesh import DATA_AXIS


def make_shard_map_train_step(mesh: Mesh, apply_fn, loss_fn, tx):
    """Build a shard_map DP train step.

    apply_fn(params, images) -> preds (stateless apply; no BN mutation —
    see module docstring); loss_fn(preds, target, target_weight) -> scalar.
    batch dict arrives batch-sharded on DATA_AXIS; params replicated.
    """

    def local_step(params, opt_state, images, target, tw):
        def compute(p):
            preds = apply_fn(p, images)
            return loss_fn(preds, target, tw)

        loss, grads = jax.value_and_grad(compute)(params)
        # the DDP all-reduce: mean over the data axis, explicit
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt, loss

    batch_spec = P(DATA_AXIS)
    repl = P()
    smapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(repl, repl, batch_spec, batch_spec, batch_spec),
        out_specs=(repl, repl, repl),
        check_vma=False,
    )
    return jax.jit(smapped)
