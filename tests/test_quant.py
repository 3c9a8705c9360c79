"""int8 post-training quantization (ops/quant.py).

Covers: per-channel weight quantization error bounds, the intercepted
int8 conv vs its fp32 twin, the grouped-conv/unsupported-padding bf16
fallback, calibration scale collection, and end-to-end SimpleBaseline
quantized inference agreeing with fp32 (heatmap correlation + decoded
coordinates)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpupose.ops.quant import (calibrate, make_quant_interceptor,
                               quantize_weight, quantized_apply)


def test_quantize_weight_per_channel_bound():
    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))
    # scale one output channel way up: per-channel scaling must keep the
    # relative error of every channel bounded (per-tensor would not)
    k = k.at[..., 3].multiply(100.0)
    wq, ws = quantize_weight(k)
    assert wq.dtype == jnp.int8 and ws.shape == (16,)
    deq = wq.astype(jnp.float32) * ws / 127.0
    err = np.abs(np.asarray(deq - k))
    # max error per channel <= half a quantization step of that channel
    step = np.asarray(ws) / 127.0
    assert (err.max(axis=(0, 1, 2)) <= 0.5 * step + 1e-6).all()


class _OneConv(nn.Module):
    pad: object = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Conv(16, (3, 3), (2, 2), padding=self.pad,
                       feature_group_count=self.groups, use_bias=True,
                       dtype=jnp.float32, name="conv")(x)


def test_int8_conv_matches_fp32_within_quant_noise():
    m = _OneConv()
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 12, 8).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(v, x)
    scales = calibrate(m.apply, v, [x])
    assert set(scales) == {"conv"} and scales["conv"] > 0
    out = quantized_apply(m.apply, v, scales, x)
    # int8 conv noise: ~1e-2 relative at these magnitudes
    denom = np.abs(np.asarray(ref)).max()
    assert np.abs(np.asarray(out - ref)).max() / denom < 0.02
    # and it genuinely differs from fp32 (the int8 path actually ran)
    assert np.abs(np.asarray(out - ref)).max() > 0


def test_grouped_conv_falls_back_to_fp32_exactly():
    m = _OneConv(groups=8)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 12, 8).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(v, x)
    with pytest.raises(ValueError):
        calibrate(m.apply, v, [x])   # nothing quantizable
    # a stale/foreign scales dict must not touch the grouped conv
    with nn.intercept_methods(make_quant_interceptor(v, {"conv": 3.0})):
        out = m.apply(v, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_calibration_takes_running_max_over_batches():
    m = _OneConv()
    x_small = jnp.full((1, 8, 8, 8), 0.5, jnp.float32)
    x_big = jnp.full((1, 8, 8, 8), 4.0, jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x_small)
    scales = calibrate(m.apply, v, [x_small, x_big])
    assert np.isclose(scales["conv"], 4.0, rtol=1e-5)


class _DenseNet(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(32, name="d1")(x)
        x = nn.gelu(x)
        return nn.Dense(8, name="d2")(x)


def test_int8_dense_matches_fp32_within_quant_noise():
    m = _DenseNet()
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 10, 16).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(v, x)
    scales = calibrate(m.apply, v, [x])
    assert set(scales) == {"d1", "d2"}
    out = quantized_apply(m.apply, v, scales, x)
    denom = np.abs(np.asarray(ref)).max()
    assert 0 < np.abs(np.asarray(out - ref)).max() / denom < 0.02


@pytest.mark.slow
def test_yolo_predictor_int8_end_to_end():
    """DINOv3Pose (ConvNeXt backbone: dense pointwise quantized, depthwise
    in bf16) through the quantized YoloPosePredictor: same fixed-size
    detection outputs, near-identical raw scores."""
    import optax

    from tpupose.engine.predictor import YoloPosePredictor
    from tpupose.engine.train_state import create_train_state
    from tpupose.models.dinov3_pose import DINOv3Pose

    K, NC, S = 4, 2, 128
    model = DINOv3Pose(backbone="dinov3_convnext_atto", num_keypoints=K,
                       num_classes=NC, neck_channels=(48, 96, 192),
                       dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, S, S, 3)), optax.sgd(0.0))
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (2, S, S, 3)).astype(np.uint8)

    scales = YoloPosePredictor.calibrate_int8(state, imgs)
    assert len(scales) > 10

    ref = YoloPosePredictor(state, num_classes=NC, num_keypoints=K,
                            conf_threshold=0.0)(imgs)
    q = YoloPosePredictor(state, num_classes=NC, num_keypoints=K,
                          conf_threshold=0.0, quant_scales=scales)(imgs)
    assert q["boxes"].shape == ref["boxes"].shape
    assert q["keypoints"].shape == ref["keypoints"].shape
    # scores of the top detections track fp32 closely
    assert np.abs(q["scores"] - ref["scores"]).max() < 0.05


@pytest.mark.slow
def test_simple_baseline_int8_end_to_end():
    """Quantized SimpleBaseline inference tracks fp32: high heatmap
    correlation and near-identical decoded keypoints."""
    from tpupose.engine.predictor import HeatmapPredictor
    from tpupose.engine.train_state import create_train_state
    from tpupose.models.simple_baseline import SimpleBaseline
    from tpupose.ops.decode import decode_heatmaps
    from tpupose.ops.preprocess import normalize_images
    import optax

    H, W = 64, 64
    model = SimpleBaseline(backbone="resnet18", num_keypoints=4,
                           dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, H, W, 3)), optax.sgd(0.0))
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (4, H, W, 3)).astype(np.uint8)

    scales = HeatmapPredictor.calibrate_int8(state, imgs)
    assert len(scales) > 15   # every dense conv in R18 + head calibrated

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    x = normalize_images(jnp.asarray(imgs))
    hm_ref = np.asarray(state.apply_fn(variables, x, train=False))
    hm_q = np.asarray(quantized_apply(state.apply_fn, variables, scales,
                                      x, train=False))
    corr = np.corrcoef(hm_ref.ravel(), hm_q.ravel())[0, 1]
    assert corr > 0.995, corr

    def decode(hm):
        c, s = decode_heatmaps(jnp.transpose(jnp.asarray(hm), (0, 3, 1, 2)),
                               method="dark")
        return np.asarray(c)
    c_ref, c_q = decode(hm_ref), decode(hm_q)
    # decoded joints within 1px of fp32 for the overwhelming majority
    close = (np.abs(c_ref - c_q).max(-1) <= 1.0).mean()
    assert close >= 0.9, close

    # the predictor surface accepts the scales end-to-end
    pred = HeatmapPredictor(state, (16, 16), quant_scales=scales)
    coords, conf = pred(imgs)
    assert coords.shape == (4, 4, 2) and conf.shape == (4, 4)
