"""Pallas MXU affine warp vs the XLA gather oracle (interpret mode on CPU;
the compiled kernel is exercised on TPU by bench config 3 and the warp
experiment — 108 ms -> 7.4 ms for (64,256,192,3))."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpupose.ops.affine import batched_affine_warp
from tpupose.ops.pallas_warp import TILE, affine_warp_auto, pallas_affine_warp


def _mats(B, H, W, seed=0, max_rot=0.8):
    rng = np.random.RandomState(seed)
    theta = rng.uniform(-max_rot, max_rot, B)
    mult = rng.uniform(0.6, 1.4, B)
    A = np.stack([np.stack([np.cos(theta), -np.sin(theta)], -1),
                  np.stack([np.sin(theta), np.cos(theta)], -1)],
                 -2) * mult[:, None, None]
    c = np.array([W / 2, H / 2])
    t = c - A @ c
    return np.concatenate([A, t[..., None]], -1).astype(np.float32)


def test_kernel_matches_xla_oracle_interpret():
    B, H, W = 2, 32, 24
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.randint(0, 255, (B, H, W, 3)).astype(np.float32))
    mats = jnp.asarray(_mats(B, H, W))
    ref = batched_affine_warp(imgs, mats, (H, W))
    got = pallas_affine_warp(imgs, mats, (H, W), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)


def test_zero_fill_outside_source():
    # big translation pushes most of the view off the image -> zeros
    B, H, W = 1, 16, 16
    imgs = jnp.ones((B, H, W, 3), jnp.float32) * 200.0
    mats = jnp.asarray(np.array(
        [[[1.0, 0.0, 100.0], [0.0, 1.0, 100.0]]], np.float32))
    got = np.asarray(pallas_affine_warp(imgs, mats, (H, W), interpret=True))
    assert got.max() == 0.0


def test_rectangular_and_downscale_out():
    B, H, W = 2, 40, 32
    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.randint(0, 255, (B, H, W, 3)).astype(np.float32))
    mats = jnp.asarray(_mats(B, H, W, seed=3))
    out_size = (16, 24)  # Ho % TILE == 0, different aspect
    ref = batched_affine_warp(imgs, mats, out_size)
    got = pallas_affine_warp(imgs, mats, out_size, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)


def test_tile_constraint_and_auto_fallback():
    B, H, W = 1, 16, 16
    imgs = jnp.zeros((B, H, W, 3), jnp.float32)
    mats = jnp.asarray(_mats(B, H, W))
    with pytest.raises(ValueError):
        pallas_affine_warp(imgs, mats, (TILE + 1, 16))
    # auto path on CPU: falls back to the XLA warp, any size works
    out = affine_warp_auto(imgs, mats, (TILE + 1, 16))
    assert out.shape == (B, TILE + 1, 16, 3)
