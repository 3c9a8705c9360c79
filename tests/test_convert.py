"""PyTorch -> Flax weight conversion: functional parity at the primitive
level, and full-tree structural compatibility for the backbone converters
(the parity harness SURVEY.md §4/§7 calls for)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import flax.linen as nn  # noqa: E402

from tpupose.utils.convert import (  # noqa: E402
    conv_kernel, convert_convnext, convert_resnet, dwconv_kernel,
    linear_kernel, ln_params, t2n,
)


def test_conv2d_parity():
    tc = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=True)
    x = np.random.RandomState(0).randn(2, 6, 6, 3).astype(np.float32)
    with torch.no_grad():
        want = tc(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    fc = nn.Conv(8, (3, 3), (2, 2), padding=1, dtype=jnp.float32)
    params = {"kernel": conv_kernel(tc.weight), "bias": t2n(tc.bias)}
    got = fc.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-5)


def test_depthwise_conv_parity():
    C = 6
    tc = torch.nn.Conv2d(C, C, 7, padding=3, groups=C)
    x = np.random.RandomState(1).randn(1, 9, 9, C).astype(np.float32)
    with torch.no_grad():
        want = tc(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    fc = nn.Conv(C, (7, 7), padding=3, feature_group_count=C, dtype=jnp.float32)
    params = {"kernel": dwconv_kernel(tc.weight), "bias": t2n(tc.bias)}
    got = fc.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-4)


def test_linear_and_layernorm_parity():
    tl = torch.nn.Linear(16, 8)
    tn = torch.nn.LayerNorm(16, eps=1e-6)
    x = np.random.RandomState(2).randn(4, 16).astype(np.float32)
    with torch.no_grad():
        want = tl(tn(torch.from_numpy(x))).numpy()
    sd = {"n.weight": tn.weight, "n.bias": tn.bias}
    fn_ = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
    normed = fn_.apply({"params": ln_params("n", sd)}, jnp.asarray(x))
    fl = nn.Dense(8, dtype=jnp.float32)
    got = fl.apply({"params": {"kernel": linear_kernel(tl.weight),
                               "bias": t2n(tl.bias)}}, normed)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_batchnorm_parity():
    tb = torch.nn.BatchNorm2d(4)
    tb.eval()
    with torch.no_grad():
        tb.running_mean.uniform_(-1, 1)
        tb.running_var.uniform_(0.5, 2)
        tb.weight.uniform_(0.5, 1.5)
        tb.bias.uniform_(-1, 1)
    x = np.random.RandomState(3).randn(2, 5, 5, 4).astype(np.float32)
    with torch.no_grad():
        want = tb(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    from tpupose.utils.convert import bn_params

    sd = {"b.weight": tb.weight, "b.bias": tb.bias,
          "b.running_mean": tb.running_mean, "b.running_var": tb.running_var}
    p, s = bn_params("b", sd)
    fb = nn.BatchNorm(use_running_average=True, epsilon=1e-5, dtype=jnp.float32)
    got = fb.apply({"params": p, "batch_stats": s}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-5)


def _fake_resnet_sd(stage_sizes=(2, 2), bottleneck=False, width=4):
    """torchvision-naming random state dict for a tiny ResNet."""
    rng = np.random.RandomState(0)
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = torch.from_numpy(
            rng.randn(o, i, k, k).astype(np.float32) * 0.1)

    def bn(name, c):
        sd[name + ".weight"] = torch.ones(c)
        sd[name + ".bias"] = torch.zeros(c)
        # non-trivial running stats so tests can detect dropped batch_stats
        sd[name + ".running_mean"] = torch.from_numpy(
            rng.randn(c).astype(np.float32) * 0.05)
        sd[name + ".running_var"] = torch.from_numpy(
            1.0 + rng.rand(c).astype(np.float32) * 0.1)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    widths = [64, 128, 256, 512]
    in_ch = 64
    for li, size in enumerate(stage_sizes):
        w = widths[li]
        for j in range(size):
            t = f"layer{li+1}.{j}"
            conv(f"{t}.conv1", w, in_ch if j == 0 else w, 3)
            bn(f"{t}.bn1", w)
            conv(f"{t}.conv2", w, w, 3)
            bn(f"{t}.bn2", w)
            if j == 0 and (li > 0 or in_ch != w):
                conv(f"{t}.downsample.0", w, in_ch, 1)
                bn(f"{t}.downsample.1", w)
        in_ch = w
    return sd


def test_convert_resnet_tree_loads():
    """Converted tree must have exactly the shapes our ResNet init produces."""
    from tpupose.models.backbones.resnet import ResNet, BasicBlock

    sd = _fake_resnet_sd(stage_sizes=(2, 2))
    tree = convert_resnet(sd, stage_sizes=(2, 2), bottleneck=False)
    m = ResNet(block_cls=BasicBlock, stage_sizes=(2, 2), dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    ref = m.init(jax.random.PRNGKey(0), x, train=False)

    def shapes(t):
        return jax.tree_util.tree_map(lambda a: jnp.asarray(a).shape, t)

    assert shapes(ref["params"]) == shapes(tree["params"])
    assert shapes(ref["batch_stats"]) == shapes(tree["batch_stats"])
    # and it actually runs
    out = m.apply({"params": tree["params"],
                   "batch_stats": tree["batch_stats"]}, x, train=False)
    assert np.isfinite(np.asarray(out)).all()


def _fake_convnext_sd(depths=(2, 2), dims=(8, 16)):
    rng = np.random.RandomState(0)
    sd = {}

    def T(name, *shape):
        sd[name] = torch.from_numpy(rng.randn(*shape).astype(np.float32) * 0.1)

    T("downsample_layers.0.0.weight", dims[0], 3, 4, 4)
    T("downsample_layers.0.0.bias", dims[0])
    T("downsample_layers.0.1.weight", dims[0])
    T("downsample_layers.0.1.bias", dims[0])
    for i in range(1, len(depths)):
        T(f"downsample_layers.{i}.0.weight", dims[i - 1])
        T(f"downsample_layers.{i}.0.bias", dims[i - 1])
        T(f"downsample_layers.{i}.1.weight", dims[i], dims[i - 1], 2, 2)
        T(f"downsample_layers.{i}.1.bias", dims[i])
    for si, depth in enumerate(depths):
        d = dims[si]
        for j in range(depth):
            t = f"stages.{si}.{j}"
            T(f"{t}.dwconv.weight", d, 1, 7, 7)
            T(f"{t}.dwconv.bias", d)
            T(f"{t}.norm.weight", d)
            T(f"{t}.norm.bias", d)
            T(f"{t}.pwconv1.weight", 4 * d, d)
            T(f"{t}.pwconv1.bias", 4 * d)
            T(f"{t}.pwconv2.weight", d, 4 * d)
            T(f"{t}.pwconv2.bias", d)
            T(f"{t}.gamma", d)
    return sd


def test_convert_convnext_tree_loads():
    from tpupose.models.backbones.convnext import ConvNeXt

    depths, dims = (2, 2), (8, 16)
    sd = _fake_convnext_sd(depths, dims)
    tree = convert_convnext(sd, depths)
    m = ConvNeXt(depths=depths, dims=dims, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    ref = m.init(jax.random.PRNGKey(0), x, train=False)

    def shapes(t):
        return jax.tree_util.tree_map(lambda a: jnp.asarray(a).shape, t)

    assert shapes(ref["params"]) == shapes(tree["params"])
    feats = m.apply({"params": tree["params"]}, x, train=False)
    assert np.isfinite(np.asarray(feats[-1])).all()


def test_deconv_parity():
    """torch ConvTranspose2d(k=4, s=2, p=1) — the MSRA SimpleBaseline deconv
    — must match flax ConvTranspose with the converted (180-degree-rotated)
    kernel (the HeatmapHead configuration, tpupose/models/heads.py:32)."""
    from tpupose.utils.convert import deconv_kernel

    tc = torch.nn.ConvTranspose2d(6, 4, 4, stride=2, padding=1, bias=False)
    x = np.random.RandomState(4).randn(2, 5, 7, 6).astype(np.float32)
    with torch.no_grad():
        want = tc(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    fc = nn.ConvTranspose(4, (4, 4), strides=(2, 2), padding="SAME",
                          use_bias=False, dtype=jnp.float32)
    got = fc.apply({"params": {"kernel": deconv_kernel(tc.weight)}},
                   jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-5)
