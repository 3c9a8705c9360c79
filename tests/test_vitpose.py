"""ViTPose: plain ViT backbone + heatmap decoder (models/vitpose.py) —
shapes for both decoders, builder wiring, lr-split/freeze paths, and a
gradient-flow check through the trainable decoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# full-model compiles: slow tier (tests/README.md)
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("decoder", ["classic", "simple"])
def test_vitpose_output_shape(decoder):
    from tpupose.models.vitpose import ViTPose

    m = ViTPose(backbone="vit_small", num_keypoints=5, decoder=decoder,
                deconv_channels=(32, 32), dtype=jnp.float32)
    x = jnp.zeros((2, 64, 48, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    # /16 patch grid upsampled 4x -> /4 heatmaps, same ratio as the graded
    # SimpleBaseline protocol (256x192 -> 64x48)
    assert out.shape == (2, 16, 12, 5)
    assert out.dtype == jnp.float32


def test_vitpose_builder_wiring_and_lr_split():
    from tpupose.configs.parser import load_config
    from tpupose.engine.builder import Builder, is_backbone_path
    from tpupose.models.vitpose import ViTPose

    cfg = load_config("tpupose/configs/method/vitpose_s.yaml")
    cfg = cfg.clone()
    cfg.model.num_keypoints = 4
    model = Builder(cfg).model()
    assert isinstance(model, ViTPose)
    assert model.decoder == "classic"
    # the DinoViT_0 subtree must register as backbone for the two-group
    # lr split / freeze predicate (HPE/train.py:39-55 analog)
    assert is_backbone_path(("DinoViT_0", "patch_embed", "kernel"))
    assert not is_backbone_path(("ConvTranspose_0", "kernel"))


def test_vitpose_frozen_backbone_gradients():
    """freeze_backbone stops gradients at the backbone boundary: decoder
    grads are nonzero, backbone grads are exactly zero."""
    from tpupose.models.vitpose import ViTPose

    m = ViTPose(backbone="vit_small", num_keypoints=3, decoder="simple",
                deconv_channels=(16, 16), freeze_backbone=True,
                dtype=jnp.float32)
    x = jnp.ones((1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params):
        out = m.apply({"params": params, **{k: v[k] for k in v if k != "params"}},
                      x, train=False)
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(v["params"])
    bb = jax.tree_util.tree_leaves(g["DinoViT_0"])
    head = [leaf for k, sub in g.items() if k != "DinoViT_0"
            for leaf in jax.tree_util.tree_leaves(sub)]
    assert all(np.allclose(leaf, 0.0) for leaf in bb)
    assert any(float(jnp.abs(leaf).max()) > 0 for leaf in head)
