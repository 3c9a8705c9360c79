"""train.remat (selective rematerialization, models/remat.py).

The contract under test: flipping remat on
  (a) leaves the parameter tree byte-identical (checkpoints stay loadable
      across the flag — the reason remat lifts the unbound method instead
      of nn.remat(Module), which renames params to remat(CheckpointBlk_N)),
  (b) changes no outputs and no gradients (pure execution-plan choice),
  (c) actually inserts jax.checkpoint regions into the program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpupose.models.backbones.hrnet import HRNetPose
from tpupose.models.backbones.vit import DinoViT
from tpupose.models.simple_baseline import SimpleBaseline

# full-model compiles: slow tier (tests/README.md)
pytestmark = pytest.mark.slow


def _tree_paths(tree):
    return {jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_leaves_with_path(tree)}


def _grads(model, variables, x):
    def loss(params):
        out, _ = model.apply(
            {**variables, "params": params}, x, train=True,
            mutable=["batch_stats"])
        if isinstance(out, dict):
            out = out["feature_map"]
        return jnp.sum(out.astype(jnp.float32) ** 2)

    return jax.grad(loss)(variables["params"])


def _grads_pure(model, variables, x):
    def loss(params):
        out = model.apply({**variables, "params": params}, x, train=True)
        if isinstance(out, dict):
            out = out["feature_map"]
        return jnp.sum(out.astype(jnp.float32) ** 2)

    return jax.grad(loss)(variables["params"])


CASES = [
    ("simple_baseline", lambda r: SimpleBaseline(
        backbone="resnet18", num_keypoints=4, deconv_channels=(32,),
        dtype=jnp.float32, remat=r), (1, 32, 32, 3), False),
    ("hrnet", lambda r: HRNetPose(
        variant="hrnet_w18", num_keypoints=4, dtype=jnp.float32, remat=r),
     (1, 32, 32, 3), False),
    ("vit", lambda r: DinoViT(
        depth=2, dim=32, heads=2, patch_size=16, dtype=jnp.float32, remat=r),
     (1, 32, 32, 3), True),
]


@pytest.mark.parametrize("name,make,shape,pure", CASES,
                         ids=[c[0] for c in CASES])
def test_remat_is_execution_plan_only(name, make, shape, pure):
    x = jnp.asarray(np.random.RandomState(0).randn(*shape), jnp.float32)
    base, remat = make(False), make(True)
    variables = base.init(jax.random.PRNGKey(0), x, train=True)

    # (a) identical parameter tree: the remat model loads the base init as-is
    v2 = remat.init(jax.random.PRNGKey(0), x, train=True)
    assert _tree_paths(variables) == _tree_paths(v2)

    grads_fn = _grads_pure if pure else _grads
    g0 = grads_fn(base, variables, x)
    g1 = grads_fn(remat, variables, x)

    # (b) bit-equal grads — same program modulo recompute scheduling
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)

    # (c) the checkpoint primitive is present in the remat program only
    def fwd(model):
        kw = {} if pure else {"mutable": ["batch_stats"]}
        return str(jax.make_jaxpr(
            lambda p: model.apply({**variables, "params": p}, x, train=True,
                                  **kw))(variables["params"]))

    assert "remat" in fwd(remat)
    assert "remat" not in fwd(base)


def test_builder_threads_remat():
    from tpupose.configs.default import default_config
    from tpupose.engine.builder import Builder

    cfg = default_config()
    cfg.train.remat = True
    cfg.model.name = "simple_baseline"
    cfg.model.backbone = "resnet18"
    model = Builder(cfg).model()
    assert model.remat is True
