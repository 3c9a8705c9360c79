"""ops/attention.fused_attention — the flash-attention dispatch used by
the ViT backbone (models/backbones/vit.py).

On CPU (this suite) the wrapper takes the SDPA fallback; these tests pin
the wrapper contract (shapes, scale handling, gradient flow) that both
branches share. The Pallas branch's numerics were validated on the real
chip: whole-DINOv3Pose-ViT-S forward matches SDPA to rel 1.5e-6, grads to
bf16 tolerance (r2 log; see module docstring for the measured 2.5x)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpupose.ops.attention import fused_attention


def _sdpa(q, k, v, scale):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), v)


def test_matches_reference_softmax_attention():
    rng = np.random.RandomState(0)
    B, L, h, D = 2, 37, 3, 16
    q, k, v = (jnp.asarray(rng.randn(B, L, h, D), jnp.float32)
               for _ in range(3))
    out = fused_attention(q, k, v)
    ref = _sdpa(q, k, v, 1.0 / np.sqrt(D))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_explicit_scale():
    rng = np.random.RandomState(1)
    B, L, h, D = 1, 12, 2, 8
    q, k, v = (jnp.asarray(rng.randn(B, L, h, D), jnp.float32)
               for _ in range(3))
    out = fused_attention(q, k, v, scale=0.5)
    ref = _sdpa(q, k, v, 0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_gradients_flow():
    rng = np.random.RandomState(2)
    B, L, h, D = 2, 21, 2, 8
    q, k, v = (jnp.asarray(rng.randn(B, L, h, D), jnp.float32)
               for _ in range(3))

    def loss(q, k, v):
        return jnp.sum(fused_attention(q, k, v) ** 2)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in (gq, gk, gv):
        assert g.shape == q.shape
        assert float(jnp.abs(g).max()) > 0.0
        assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_jit_and_vit_shapes():
    # the DINOv3 pose shape family: prefix tokens make L % 128 != 0
    rng = np.random.RandomState(3)
    B, L, h, D = 2, 105, 6, 64   # 100 patches + cls + 4 storage
    q, k, v = (jnp.asarray(rng.randn(B, L, h, D), jnp.bfloat16)
               for _ in range(3))
    out = jax.jit(fused_attention)(q, k, v)
    assert out.shape == (B, L, h, D)
    ref = _sdpa(q, k, v, 1.0 / np.sqrt(D))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2)
