"""Exporter — serialize trained models for deployment.

The reference declares exporter modules but never implements them
(HPE/engine/exporter.py, pose/pose/engine/exporter.py are empty —
SURVEY.md §2.11). This working version exports:

- `.npz` flat weights (portable, framework-agnostic), and
- StableHLO via jax.export (the TPU analog of ONNX/torchscript export):
  a serialized compiled function loadable without the model code.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def export_npz(state, path: str):
    """{params, batch_stats} -> flat .npz with slash-joined keys."""
    flat = {}
    flat.update({f"params/{k}": v for k, v in _flatten(state.params).items()})
    flat.update({f"batch_stats/{k}": v
                 for k, v in _flatten(state.batch_stats).items()})
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)
    return path


def load_npz(path: str) -> dict:
    """Inverse of export_npz: nested {params, batch_stats} tree."""
    flat = np.load(path)
    tree: dict = {}
    for key in flat.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return tree


def export_stablehlo(fn, example_args, path: str):
    """Serialize a jitted function to portable StableHLO bytes."""
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(*example_args)
    data = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_stablehlo(path: str):
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    return exported.call
