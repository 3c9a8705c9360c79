"""Attention / GatedAttention / GaussianPooling / MetaSpace tests —
the shape/grad assertions the reference keeps in __main__ blocks
(HPE/models/nn/modules/attention.py:118-164, meta.py:266-328)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpupose.models.attention import Attention, GatedAttention
from tpupose.models.meta import MetaSpace, gaussian_pool


def test_attention_shapes_and_mask():
    m = Attention(dim=32, num_heads=4, dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 10, 32), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (2, 10, 32)
    # masking out token 0 changes outputs of other tokens
    mask = jnp.ones((2, 10), bool).at[:, 0].set(False)
    out_m = m.apply(v, x, mask=mask)
    assert not np.allclose(np.asarray(out), np.asarray(out_m))


def test_gated_attention_gate_range_and_shapes():
    for mode, gshape in (("elementwise", (2, 6, 32)), ("headwise", (2, 6, 4))):
        m = GatedAttention(dim=32, num_heads=4, gate_mode=mode, dtype=jnp.float32)
        x = jnp.asarray(np.random.RandomState(1).randn(2, 6, 32), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        out, gate = m.apply(v, x, return_gate=True)
        assert out.shape == (2, 6, 32)
        assert gate.shape == gshape
        g = np.asarray(gate)
        assert (g >= 0).all() and (g <= 1).all()


def test_gated_attention_grads_flow():
    m = GatedAttention(dim=16, num_heads=2, dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 4, 16), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)

    def f(params):
        return jnp.sum(m.apply({"params": params}, x) ** 2)

    g = jax.grad(f)(v["params"])
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert total > 0


def test_gaussian_pool_peak_at_keypoint():
    B, H, W, C = 1, 16, 16, 4
    feat = np.zeros((B, H, W, C), np.float32)
    feat[0, 5, 7, :] = 10.0  # single hot pixel at (x=7, y=5)
    kpts = jnp.asarray([[[7.0, 5.0]]])
    vis = jnp.ones((1, 1))
    out = gaussian_pool(jnp.asarray(feat), kpts, vis)
    # weighted average: 10 * w_center / sum(5x5 sigma=2 weights) ~= 0.63
    assert 0.5 < float(out[0, 0, 0]) < 0.8
    # far-away keypoint sees zeros
    out2 = gaussian_pool(jnp.asarray(feat), jnp.asarray([[[1.0, 14.0]]]), vis)
    assert float(jnp.abs(out2).max()) == 0.0
    # invisible -> zeroed
    out3 = gaussian_pool(jnp.asarray(feat), kpts, jnp.zeros((1, 1)))
    assert float(jnp.abs(out3).max()) == 0.0


def test_metaspace_accumulate_update_fuse():
    K, D, L = 3, 16, 2
    ms = MetaSpace(num_keypoints=K, dim=D, num_levels=L, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(2, 8, 8, D), jnp.float32) for _ in range(L)]
    kpts = [jnp.asarray(rng.uniform(1, 6, (2, K, 2)), jnp.float32) for _ in range(L)]
    vis = jnp.ones((2, K))
    variables = ms.init(jax.random.PRNGKey(0), feats, kpts, vis)
    outs, mut = ms.apply(variables, feats, kpts, vis,
                         mutable=["meta_space"])
    assert len(outs) == L and outs[0].shape == (2, K, D)
    # accumulation happened
    assert float(mut["meta_space"]["feature_count"].sum()) == 2 * K * L

    # EMA update: counts reset, memory becomes the accumulated mean
    v2 = {"params": variables["params"], "meta_space": mut["meta_space"]}
    _, mut2 = ms.apply(v2, method=ms.update_meta_spaces,
                       mutable=["meta_space"])
    assert float(mut2["meta_space"]["feature_count"].sum()) == 0.0
    assert float(jnp.abs(mut2["meta_space"]["meta_features"]).sum()) > 0

    # second epoch: EMA blends (momentum 0.9)
    v3 = {"params": variables["params"], "meta_space": mut2["meta_space"]}
    _, mut3 = ms.apply(v3, feats, kpts, vis, mutable=["meta_space"])
    v4 = {"params": variables["params"], "meta_space": mut3["meta_space"]}
    _, mut4 = ms.apply(v4, method=ms.update_meta_spaces, mutable=["meta_space"])
    m_before = np.asarray(mut2["meta_space"]["meta_features"])
    m_after = np.asarray(mut4["meta_space"]["meta_features"])
    # same data accumulated -> EMA with identical mean keeps values close
    np.testing.assert_allclose(m_after, m_before, atol=1e-4)
