"""ALL-Pallas int8 serving engine (ops/pallas_engine.py + pallas_stages
+ pallas_head): kernel-vs-oracle exactness pins (CPU interpreter) and
semantic checks of the oracles against flax/lax (quant-tolerance).

Two-level strategy: the jnp oracles mirror the kernels op-for-op, so
kernel<->oracle must agree to <=1 int8 count on a tiny fraction of
elements (f32 accumulation-order round flips only); oracle<->flax
carries the quantization error and is checked at ~5% relative, like the
bridge/stem kernel tests (tests/test_pallas_bridge.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpupose.models.simple_baseline import SimpleBaseline
from tpupose.ops.pallas_head import build_deconv_spec, deconv_oracle, run_deconv
from tpupose.ops.pallas_stages import build_stage_chunks, chunk_oracle, run_chunk


def _rand_block_weights(rs, cin, cmid, cout, proj, stride):
    w = {}
    w["B_0/c0"] = (rs.normal(0, 0.1, (1, 1, cin, cmid)),
                   rs.normal(0, 0.05, cmid))
    w["B_0/c1"] = (rs.normal(0, 0.1, (3, 3, cmid, cmid)),
                   rs.normal(0, 0.05, cmid))
    w["B_0/c2"] = (rs.normal(0, 0.1, (1, 1, cmid, cout)),
                   rs.normal(0, 0.05, cout))
    if proj:
        w["B_0/proj"] = (rs.normal(0, 0.1, (1, 1, cin, cout)),
                         rs.normal(0, 0.05, cout))
    w["B_1/c0"] = (rs.normal(0, 0.1, (1, 1, cout, cmid)),
                   rs.normal(0, 0.05, cmid))
    w["B_1/c1"] = (rs.normal(0, 0.1, (3, 3, cmid, cmid)),
                   rs.normal(0, 0.05, cmid))
    w["B_1/c2"] = (rs.normal(0, 0.1, (1, 1, cmid, cout)),
                   rs.normal(0, 0.05, cout))
    return w


def _f32_conv(h, k, b, stride=1, pad=0):
    y = jax.lax.conv_general_dilated(
        jnp.asarray(h, jnp.float32), jnp.asarray(k, jnp.float32),
        (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return np.asarray(y) + np.asarray(b, np.float32)


def _f32_stage(weights, xf, stride):
    """f32 bottleneck x2 on the raw weights; returns (out, calibrated
    scales) — scales derived from the actual activation maxima, as the
    engine's calibration forward does."""
    sc = {}
    h = np.maximum(_f32_conv(xf, *weights["B_0/c0"]), 0)
    sc["B_0/c0"] = h.max() / 127.0
    h = np.maximum(_f32_conv(h, *weights["B_0/c1"], stride=stride, pad=1), 0)
    sc["B_0/c1"] = h.max() / 127.0
    h = _f32_conv(h, *weights["B_0/c2"])
    res = _f32_conv(xf, *weights["B_0/proj"], stride=stride)
    h = np.maximum(h + res, 0)
    add0 = h.max() / 127.0
    y = np.maximum(_f32_conv(h, *weights["B_1/c0"]), 0)
    sc["B_1/c0"] = y.max() / 127.0
    y = np.maximum(_f32_conv(y, *weights["B_1/c1"], pad=1), 0)
    sc["B_1/c1"] = y.max() / 127.0
    y = _f32_conv(y, *weights["B_1/c2"])
    out = np.maximum(y + h, 0)
    add1 = out.max() / 127.0
    return out, sc, {0: add0, 1: add1}


def _mini_stage(stride, h=8, w=8, cin=128, cmid=128, cout=256):
    rs = np.random.RandomState(0)
    weights = _rand_block_weights(rs, cin, cmid, cout, True, stride)
    s_in = 0.05
    x = jnp.asarray(rs.randint(0, 90, (2, h, w, cin)), jnp.int8)
    xf = np.asarray(x, np.float32) * s_in
    ref, conv_scale, add_scales = _f32_stage(weights, xf, stride)
    chunks, s_out = build_stage_chunks(
        weights, conv_scale, add_scales, (0, 1), s_in, h, w, cin, cmid,
        stride, block_prefix="B")
    assert len(chunks) == 1
    return chunks[0], x, s_out, ref


def _count_diff(a, b):
    d = np.abs(np.asarray(a, np.int32) - np.asarray(b, np.int32))
    return d.max(), (d > 0).mean()


@pytest.mark.parametrize("stride", [1, 2])
def test_chunk_kernel_matches_oracle(stride):
    spec, x, _, _ = _mini_stage(stride)
    got = run_chunk(x, spec, interpret=True)
    ref = chunk_oracle(x, spec)
    assert got.shape == ref.shape
    assert got.shape[1] == x.shape[1] // stride
    mx, frac = _count_diff(got, ref)
    assert mx <= 1 and frac < 0.01, (mx, frac)


def test_chunk_oracle_matches_flax_math():
    """The int8 oracle vs the plain f32 bottleneck math on the same
    folded weights: agreement within quantization tolerance."""
    spec, x, s_out, ref = _mini_stage(2)
    got = np.asarray(chunk_oracle(x, spec), np.float32) * s_out
    denom = max(np.abs(ref).max(), 1e-6)
    assert np.abs(got - ref).max() / denom < 0.06
    assert np.abs(got - ref).mean() / denom < 0.01


def test_deconv_kernel_matches_oracle():
    rs = np.random.RandomState(1)
    k = rs.normal(0, 0.1, (4, 4, 128, 64))
    b = rs.normal(0, 0.05, 64)
    spec = build_deconv_spec(k, b, 0.04, 0.03)
    x = jnp.asarray(rs.randint(0, 90, (2, 8, 6, 128)), jnp.int8)
    got = run_deconv(x, spec, interpret=True)
    ref = deconv_oracle(x, spec, 8, 6)
    assert got.shape == (2, 16, 12, 64)
    mx, frac = _count_diff(got, ref)
    assert mx <= 1 and frac < 0.01, (mx, frac)


def test_deconv_oracle_matches_lax_conv_transpose():
    """Pins the phase/tap table against lax.conv_transpose(k=4, s=2,
    'SAME', transpose_kernel=False) — the engine/flax semantics."""
    rs = np.random.RandomState(2)
    k = rs.normal(0, 0.1, (4, 4, 128, 64))
    b = rs.normal(0, 0.05, 64)
    s_in = 0.04
    x = jnp.asarray(rs.randint(0, 90, (2, 8, 6, 128)), jnp.int8)

    xf = jnp.asarray(np.asarray(x, np.float32) * s_in)
    ref = jax.lax.conv_transpose(
        xf, jnp.asarray(k, jnp.float32), (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=False) + jnp.asarray(b, jnp.float32)
    ref = np.maximum(np.asarray(ref), 0)

    s_out = float(ref.max()) / 127.0       # calibrated, like the engine
    spec = build_deconv_spec(k, b, s_in, s_out)
    got = np.asarray(deconv_oracle(x, spec, 8, 6), np.float32) * s_out
    denom = max(ref.max(), 1e-6)
    assert np.abs(got - ref).max() / denom < 0.05
    assert np.abs(got - ref).mean() / denom < 0.01


def test_deconv_with_fused_final():
    rs = np.random.RandomState(3)
    k = rs.normal(0, 0.1, (4, 4, 128, 64))
    b = rs.normal(0, 0.05, 64)
    kf = rs.normal(0, 0.2, (1, 1, 64, 17))
    bf = rs.normal(0, 0.1, 17)
    spec = build_deconv_spec(k, b, 0.04, 0.03, final=(kf, bf, 0.03))
    x = jnp.asarray(rs.randint(0, 90, (2, 8, 6, 128)), jnp.int8)
    got = np.asarray(run_deconv(x, spec, interpret=True))
    ref = np.asarray(deconv_oracle(x, spec, 8, 6))
    assert got.shape == (2, 16, 12, 32)          # 17 padded to 32 lanes
    assert np.allclose(got, ref, atol=1e-3 * np.abs(ref).max())


@pytest.mark.slow
def test_engine_e2e_matches_flax_model():
    """Full uint8 -> heatmaps chain vs the bf16 flax model."""
    from tpupose.ops.pallas_engine import PallasServingEngine

    model = SimpleBaseline(backbone="resnet50", num_keypoints=17,
                           dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 256, 192, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)

    rs = np.random.RandomState(4)
    imgs = rs.randint(0, 256, (2, 256, 192, 3)).astype(np.uint8)
    eng = PallasServingEngine.build(variables, calib=imgs,
                                    interpret=True)
    got = np.asarray(eng(jnp.asarray(imgs)), np.float32)
    assert got.shape == (2, 64, 48, 17)

    from tpupose.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD
    xf = (imgs.astype(np.float32) / 255.0
          - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    ref = np.asarray(model.apply(variables, jnp.asarray(xf),
                                 train=False), np.float32)
    denom = max(np.abs(ref).max(), 1e-6)
    assert np.abs(got - ref).max() / denom < 0.15
    assert np.abs(got - ref).mean() / denom < 0.02
    # decoded argmax parity (random untrained weights give near-flat
    # heatmaps, so quant noise flips some argmaxes; trained weights are
    # covered by the int8 metric-parity test protocol)
    ga = got.reshape(2, -1, 17).argmax(1)
    ra = ref.reshape(2, -1, 17).argmax(1)
    assert (ga == ra).mean() > 0.7


@pytest.mark.slow
def test_engine_build_rejects_empty_calib():
    """ADVICE r4: empty calib must raise like Int8Engine.build, not fall
    back to random-noise scale calibration."""
    from tpupose.ops.pallas_engine import PallasServingEngine

    model = SimpleBaseline(backbone="resnet50", num_keypoints=17,
                           dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 192, 3), jnp.float32),
                           train=False)
    with pytest.raises(ValueError, match="calibration"):
        PallasServingEngine.build(variables, calib=(), interpret=True)
