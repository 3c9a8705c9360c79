"""Pallas fused DARK decode vs the jnp reference path (interpret mode on
the CPU test platform; the compiled path is exercised on TPU by bench.py)."""

import jax.numpy as jnp
import numpy as np

from tpupose.ops.decode import decode_heatmaps
from tpupose.ops.heatmap import gaussian_heatmaps
from tpupose.ops.pallas_decode import dark_decode_pallas


def _maps(B=2, K=5, size=(64, 48), seed=0):
    rng = np.random.RandomState(seed)
    joints = rng.uniform([2, 2], [size[1] - 3, size[0] - 3],
                         (B, K, 2)).astype(np.float32)
    vis = np.ones((B, K), np.float32)
    hm, _ = gaussian_heatmaps(jnp.asarray(joints), jnp.asarray(vis), size)
    return hm, joints


def test_pallas_matches_jnp_reference():
    hm, joints = _maps()
    ref_c, ref_s = decode_heatmaps(hm, "dark", 11, 2.0)
    got_c, got_s = dark_decode_pallas(hm, 11, 2.0, interpret=True)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref_c), atol=2e-2)
    # and it actually recovers sub-pixel truth
    err = np.abs(np.asarray(got_c) - joints)
    assert err.max() < 0.1


def test_pallas_handles_zero_maps_and_padding():
    # BK=3 not divisible by tile -> exercises padding; map 0 is all zeros
    hm = np.zeros((1, 3, 32, 32), np.float32)
    hm[0, 1, 10, 12] = 1.0
    hm[0, 2, 3, 4] = 0.5
    c, s = dark_decode_pallas(jnp.asarray(hm), tile=2, interpret=True)
    c, s = np.asarray(c), np.asarray(s)
    assert s[0, 0] == 0.0 and tuple(c[0, 0]) == (-1.0, -1.0)
    np.testing.assert_allclose(c[0, 1], [12, 10], atol=0.5)
    np.testing.assert_allclose(s[0, 2], 0.5)
