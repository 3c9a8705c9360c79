"""Full-backbone weight conversion, end to end (VERDICT r1 item #8):
build DINOv3-layout torch modules in-test (state-dict naming per
/root/reference/HPE/models/backbones/{dinov3convnext,dinov3vit}.py and
the facebook ConvNeXt layout convert_convnext expects), convert the
weights, and assert the Flax backbones reproduce the torch outputs —
not just per-primitive parity.

torch GELU uses approximate='tanh' to match flax nn.gelu's default.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from tpupose.utils.convert import convert_convnext, convert_vit  # noqa: E402

# full-model compiles: slow tier (tests/README.md)
pytestmark = pytest.mark.slow


class LayerNormCF(nn.Module):
    """channels_first LayerNorm (the facebook ConvNeXt stem/downsample
    norm, reference norm.py:21-29)."""

    def __init__(self, c, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(c))
        self.bias = nn.Parameter(torch.zeros(c))
        self.eps = eps

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class TorchConvNeXtBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dwconv = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, 4 * dim)
        self.pwconv2 = nn.Linear(4 * dim, dim)
        self.gamma = nn.Parameter(torch.full((dim,), 1e-6))
        self.act = nn.GELU(approximate="tanh")

    def forward(self, x):
        inp = x
        x = self.dwconv(x)
        x = x.permute(0, 2, 3, 1)
        x = self.norm(x)
        x = self.pwconv2(self.act(self.pwconv1(x)))
        x = self.gamma * x
        return inp + x.permute(0, 3, 1, 2)


class TorchConvNeXt(nn.Module):
    def __init__(self, depths=(2, 2), dims=(16, 32)):
        super().__init__()
        self.downsample_layers = nn.ModuleList()
        self.downsample_layers.append(nn.Sequential(
            nn.Conv2d(3, dims[0], 4, 4), LayerNormCF(dims[0])))
        for i in range(1, len(depths)):
            self.downsample_layers.append(nn.Sequential(
                LayerNormCF(dims[i - 1]), nn.Conv2d(dims[i - 1], dims[i], 2, 2)))
        self.stages = nn.ModuleList(
            nn.Sequential(*[TorchConvNeXtBlock(dims[i]) for _ in range(depths[i])])
            for i in range(len(depths)))

    def forward(self, x):
        feats = []
        for ds, st in zip(self.downsample_layers, self.stages):
            x = st(ds(x))
            feats.append(x)
        return feats


def test_convnext_backbone_e2e_parity():
    from tpupose.models.backbones.convnext import ConvNeXt

    depths, dims = (2, 2), (16, 32)
    tm = TorchConvNeXt(depths, dims).eval()
    # non-trivial weights
    with torch.no_grad():
        for p in tm.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    x = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = [f.numpy() for f in tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))]

    tree = convert_convnext(tm.state_dict(), depths)
    fm = ConvNeXt(depths=depths, dims=dims, dtype=jnp.float32)
    got = fm.apply({"params": tree["params"]}, jnp.asarray(x), train=False)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2), w,
                                   atol=2e-4)


# ---------------------------------------------------------------------------
# DINOv3-style ViT twin (RoPE + storage tokens + layerscale)
# ---------------------------------------------------------------------------

def _rope_tables(h, w, dim, base=100.0):
    quarter = dim // 4
    freqs = 1.0 / (base ** (np.arange(quarter, dtype=np.float32) / quarter))
    ys = np.linspace(-1.0, 1.0, h).astype(np.float32)
    xs = np.linspace(-1.0, 1.0, w).astype(np.float32)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    ang = np.concatenate([gy.reshape(-1, 1) * freqs, gx.reshape(-1, 1) * freqs], -1)
    return np.sin(ang), np.cos(ang)


def _apply_rope_torch(q, sin, cos):
    # q: (B, T, heads, hd)
    d2 = q.shape[-1] // 2
    q1, q2 = q[..., :d2], q[..., d2:]
    s = torch.from_numpy(sin)[:, None, :]
    c = torch.from_numpy(cos)[:, None, :]
    return torch.cat([q1 * c - q2 * s, q2 * c + q1 * s], -1)


class TorchDinoViT(nn.Module):
    def __init__(self, depth=2, dim=32, heads=2, patch=8, storage=2):
        super().__init__()
        self.depth, self.dim, self.heads = depth, dim, heads
        self.patch, self.storage = patch, storage
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, patch)
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.storage_tokens = nn.Parameter(torch.randn(1, storage, dim) * 0.02)
        self.blocks = nn.ModuleList()
        for _ in range(depth):
            b = nn.Module()
            b.norm1 = nn.LayerNorm(dim, eps=1e-6)
            b.attn = nn.Module()
            b.attn.qkv = nn.Linear(dim, 3 * dim)
            b.attn.proj = nn.Linear(dim, dim)
            b.ls1 = nn.Module()
            b.ls1.gamma = nn.Parameter(torch.full((dim,), 1e-5))
            b.norm2 = nn.LayerNorm(dim, eps=1e-6)
            b.mlp = nn.Module()
            b.mlp.fc1 = nn.Linear(dim, 4 * dim)
            b.mlp.fc2 = nn.Linear(4 * dim, dim)
            b.ls2 = nn.Module()
            b.ls2.gamma = nn.Parameter(torch.full((dim,), 1e-5))
            self.blocks.append(b)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.act = nn.GELU(approximate="tanh")

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x)                       # (B, D, h, w)
        h, w = x.shape[2], x.shape[3]
        x = x.flatten(2).transpose(1, 2)                   # (B, hw, D)
        x = torch.cat([self.cls_token.expand(B, -1, -1),
                       self.storage_tokens.expand(B, -1, -1), x], 1)
        p = 1 + self.storage
        hd = self.dim // self.heads
        sin, cos = _rope_tables(h, w, hd)
        for b in self.blocks:
            y = b.norm1(x)
            qkv = b.attn.qkv(y)
            q, k, v = qkv.chunk(3, -1)
            T = x.shape[1]
            q = q.view(B, T, self.heads, hd)
            k = k.view(B, T, self.heads, hd)
            v = v.view(B, T, self.heads, hd)
            q = torch.cat([q[:, :p], _apply_rope_torch(q[:, p:], sin, cos)], 1)
            k = torch.cat([k[:, :p], _apply_rope_torch(k[:, p:], sin, cos)], 1)
            att = torch.softmax(
                (q.permute(0, 2, 1, 3) @ k.permute(0, 2, 3, 1)) / math.sqrt(hd), -1)
            o = (att @ v.permute(0, 2, 1, 3)).permute(0, 2, 1, 3).reshape(B, T, self.dim)
            x = x + b.ls1.gamma * b.attn.proj(o)
            y = b.norm2(x)
            x = x + b.ls2.gamma * b.mlp.fc2(self.act(b.mlp.fc1(y)))
        x = self.norm(x)
        return x[:, 0], x[:, p:].view(B, h, w, self.dim)


def test_vit_backbone_e2e_parity():
    from tpupose.models.backbones.vit import DinoViT

    tm = TorchDinoViT(depth=2, dim=32, heads=2, patch=8, storage=2).eval()
    with torch.no_grad():
        for prm in tm.parameters():
            prm.add_(torch.randn_like(prm) * 0.02)
    x = np.random.RandomState(1).randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want_cls, want_map = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    tree = convert_vit(tm.state_dict(), depth=2)
    fm = DinoViT(depth=2, dim=32, heads=2, patch_size=8,
                 num_storage_tokens=2, dtype=jnp.float32)
    out = fm.apply({"params": tree["params"]}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out["cls"]), want_cls.numpy(),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["feature_map"]),
                               want_map.numpy(), atol=5e-4)


def test_dinov3pose_vit_forward_features():
    """forward_features for the ViT family (VERDICT r1 item #6: the
    reference exposes it for both families, HPE/models/pose.py:50-65)."""
    from tpupose.models.dinov3_pose import DINOv3Pose

    m = DINOv3Pose(backbone="dinov3_vits16", num_keypoints=3, num_classes=1,
                   neck_channels=(16, 32, 64), dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    feats = m.forward_features(v, x)
    assert len(feats) == 3
    for f in feats:
        assert f.shape[0] == 1 and f.shape[-1] == 384  # vit-small dim
