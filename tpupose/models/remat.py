"""Selective rematerialization (gradient checkpointing) for the backbones.

TPU training is frequently HBM-limited before it is FLOP-limited (HRNet-W48
at 384x288, ViT at large token counts): the activation stash for the
backward pass caps the per-chip batch, and small batches starve the MXU.
`jax.checkpoint` trades that stash for recompute — the canonical TPU lever
the reference stack has no equivalent of (torch's
`torch.utils.checkpoint` is never used anywhere in /root/reference).

The subtlety this module exists for: `flax.linen.remat(Module)` rewrites
the parameter path of the wrapped module (`Blk_0` -> `remat(CheckpointBlk_0)`),
so flipping the flag would orphan every existing checkpoint. Applying the
lift to the *unbound method* and passing the already-named instance keeps
the parameter tree byte-identical — remat on/off is then purely an
execution-plan choice, proven by `tests/test_remat.py` (same params, same
outputs, same grads, jaxpr carries the checkpoint).

Granularity: one residual/transformer block per checkpoint region — peak
activation memory drops from O(depth) to O(1) blocks while recompute adds
only one extra forward, and XLA still fuses freely inside each region.
"""

from __future__ import annotations

import flax.linen as nn

# train-style flags are compile-time constants: they select Python branches
# (BatchNorm running stats, DropPath) and must be static under the lift.
TRAIN_ARG = (2,)  # position of `train` in (self, x, train)


def remat_call(mod: nn.Module, *args, static_argnums=()):
    """Run `mod(*args)` under jax.checkpoint without renaming its params.

    `static_argnums` indexes into (self, *args) — pass TRAIN_ARG for the
    conventional `__call__(self, x, train)` signature.
    """
    fn = nn.remat(type(mod).__call__, static_argnums=tuple(static_argnums))
    return fn(mod, *args)


def block_call(mod: nn.Module, x, train: bool, remat: bool):
    """The common case: a block with signature (x, train)."""
    if remat:
        return remat_call(mod, x, train, static_argnums=TRAIN_ARG)
    return mod(x, train)
