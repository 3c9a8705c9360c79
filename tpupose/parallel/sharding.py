"""Parameter sharding rules for the 2-D (data, model) mesh.

The reference replicates parameters (DDP); this module adds the optional
tensor-parallel dimension: wide conv/dense output channels are sharded
over the 'model' axis, everything else replicated. XLA inserts the
necessary collectives from these annotations (scaling-book recipe: pick a
mesh, annotate, let XLA do the rest).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpupose.parallel.mesh import MODEL_AXIS


def shard_params(mesh: Mesh, params, min_channels: int = 64):
    """Place a param tree: kernels whose last dim is divisible by the
    model-axis size (and >= min_channels) are channel-sharded; the rest
    replicated. With model axis size 1 this is pure replication."""
    msize = mesh.shape[MODEL_AXIS]
    repl = NamedSharding(mesh, P())

    def place(path, leaf):
        leaf = np.asarray(leaf) if not hasattr(leaf, "dtype") else leaf
        name = str(getattr(path[-1], "key", path[-1])) if path else ""
        if (msize > 1 and name == "kernel" and leaf.ndim >= 2
                and leaf.shape[-1] % msize == 0
                and leaf.shape[-1] >= min_channels):
            spec = P(*([None] * (leaf.ndim - 1)), MODEL_AXIS)
            return jax.device_put(leaf, NamedSharding(mesh, spec))
        return jax.device_put(leaf, repl)

    return jax.tree_util.tree_map_with_path(place, params)


def replicate(mesh: Mesh, tree):
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl) if hasattr(x, "shape") else x, tree)
