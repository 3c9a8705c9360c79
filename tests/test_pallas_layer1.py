"""Pallas-fused ResNet layer1 (ops/pallas_layer1.py) — the serving-path
kernel that attacks the measured layer1 wall (~4.1 ms of the ~9 ms R50
forward in both bf16 and int8; see the module docstring)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpupose.models.backbones.resnet import ResNet
from tpupose.ops.pallas_layer1 import (fold_layer1_weights,
                                       layer1_pallas, layer1_reference,
                                       make_layer1_interceptor)

# full-model compiles: slow tier (tests/README.md)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def backbone():
    bb = ResNet.from_name("resnet50", dtype=jnp.float32)
    v = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                train=False)
    variables = {"params": {"ResNet_0": v["params"]},
                 "batch_stats": {"ResNet_0": v["batch_stats"]}}
    return bb, v, variables


def test_kernel_matches_reference(backbone):
    _, _, variables = backbone
    w = fold_layer1_weights(variables, dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 12, 64),
                    jnp.float32)
    ref = layer1_reference(x, w)
    out = layer1_pallas(x, w, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fold_matches_flax_blocks(backbone):
    """The folded-weight reference must reproduce the REAL Bottleneck_0..2
    chain (BN folding + im2col layout + residual wiring)."""
    bb, v, variables = backbone
    rec = {}

    def spy(next_fun, args, kwargs, context):
        mod = context.module
        if (context.method_name == "__call__"
                and type(mod).__name__ == "Bottleneck"):
            if mod.name == "Bottleneck_0":
                rec["in"] = args[0]
            out = next_fun(*args, **kwargs)
            if mod.name == "Bottleneck_2":
                rec["out"] = out
            return out
        return next_fun(*args, **kwargs)

    img = jnp.asarray(np.random.RandomState(1).randn(2, 64, 64, 3),
                      jnp.float32)
    with nn.intercept_methods(spy):
        bb.apply(v, img, train=False)

    w = fold_layer1_weights(variables, dtype=jnp.float32)
    got = layer1_reference(rec["in"], w)
    ref = np.asarray(rec["out"])
    np.testing.assert_allclose(np.asarray(got), ref,
                               atol=5e-4 * np.abs(ref).max(), rtol=1e-3)


def test_interceptor_swaps_layer1(backbone):
    """model.apply under the interceptor == stock apply (bf16-folding
    tolerance); the kernel really replaces the three blocks."""
    bb, v, variables = backbone
    img = jnp.asarray(np.random.RandomState(2).randn(2, 64, 64, 3),
                      jnp.float32)
    ref = np.asarray(bb.apply(v, img, train=False))
    l1 = make_layer1_interceptor(variables, dtype=jnp.float32)
    with nn.intercept_methods(l1):
        got = np.asarray(bb.apply(v, img, train=False))
    assert got.shape == ref.shape
    denom = np.abs(ref).max()
    assert np.abs(got - ref).max() / denom < 5e-3
    c = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert c > 0.9999


def test_fast_r50_apply_end_to_end(backbone):
    """The composed serving forward (Pallas layer1 + int8 tail) tracks
    the fp32 model end-to-end on the full SimpleBaseline."""
    from tpupose.models.simple_baseline import SimpleBaseline
    from tpupose.ops.pallas_layer1 import fast_r50_apply
    from tpupose.ops.preprocess import normalize_images
    from tpupose.ops.quant import calibrate

    model = SimpleBaseline(backbone="resnet50", num_keypoints=4,
                           deconv_channels=(32, 32, 32), dtype=jnp.float32)
    imgs = np.random.RandomState(3).randint(
        0, 256, (2, 64, 48, 3)).astype(np.uint8)
    x = normalize_images(jnp.asarray(imgs), dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    scales = calibrate(model.apply, variables, [jnp.asarray(imgs)],
                       preprocess=normalize_images, train=False)
    ref = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(fast_r50_apply(model.apply, variables, scales, x,
                                    train=False))
    assert got.shape == ref.shape
    denom = np.abs(ref).max()
    assert np.abs(got - ref).max() / denom < 0.06   # int8 tail tolerance
    c = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert c > 0.99
