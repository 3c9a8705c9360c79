import jax
import jax.numpy as jnp
import numpy as np
import pytest

# full-model compiles: slow tier (tests/README.md)
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")


def test_detect_head_objectness_variant():
    """head3 parity: objectness channel multiplies class scores at decode."""
    from tpupose.models.yolo_head import DetectHead

    head = DetectHead(num_classes=2, reg_max=4, strides=(8,),
                      objectness=True, dtype=jnp.float32)
    feats = [jnp.zeros((1, 4, 4, 32))]
    v = head.init(jax.random.PRNGKey(0), feats, train=True)
    outs, _ = head.apply(v, feats, train=True, mutable=["batch_stats"])
    assert outs[0].shape == (1, 4, 4, 4 * 4 + 1 + 2)
    dec = head.apply(v, feats, train=False)
    assert dec.shape == (1, 16, 4 + 2)
    scores = np.asarray(dec[..., 4:])
    assert (scores >= 0).all() and (scores <= 1).all()


def test_load_pretrained_roundtrip(tmp_path):
    """Save a torchvision-style resnet18 state dict, load it through the
    pretrained glue, and check the backbone subtree actually changed."""
    from tests.test_convert import _fake_resnet_sd
    from tpupose.models.pretrained import load_pretrained
    from tpupose.models.simple_baseline import SimpleBaseline

    # full resnet18 state dict (4 stages)
    sd = _fake_resnet_sd(stage_sizes=(2, 2, 2, 2))
    pth = tmp_path / "resnet18.pth"
    torch.save(sd, str(pth))

    m = SimpleBaseline(backbone="resnet18", num_keypoints=4,
                       deconv_channels=(32,), dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    params = dict(v["params"])
    before = np.asarray(params["ResNet_0"]["Conv_0"]["kernel"]).copy()
    bs_before = np.asarray(
        v["batch_stats"]["ResNet_0"]["BatchNorm_0"]["mean"]).copy()
    merged, merged_bs = load_pretrained(params, str(pth), "resnet18",
                                        batch_stats=dict(v["batch_stats"]))
    after = np.asarray(merged["ResNet_0"]["Conv_0"]["kernel"])
    assert not np.allclose(before, after)
    # BN running stats must come from the checkpoint, not random init
    bs_after = np.asarray(merged_bs["ResNet_0"]["BatchNorm_0"]["mean"])
    assert not np.allclose(bs_before, bs_after)
    # merged tree still applies
    out = m.apply({"params": merged, "batch_stats": merged_bs},
                  jnp.zeros((1, 64, 64, 3)), train=False)
    assert np.isfinite(np.asarray(out)).all()


def test_load_pretrained_missing_file_keeps_params():
    from tpupose.models.pretrained import load_pretrained

    params = {"ResNet_0": {"Conv_0": {"kernel": np.ones((1, 1, 3, 4))}}}
    out, bs = load_pretrained(params, "/nonexistent.pth", "resnet18")
    assert out is params and bs == {}
