"""Fused int8 serving engine (ops/int8_engine.py).

Covers: the BN+normalize folding (folded fp32 graph == model.apply) for
both the SimpleBaseline chain and the HRNet DAG, the exact-int8 stem
input representation, the graph walk over ResNet depths, and the
end-to-end int8 engine tracking fp32 (heatmap correlation + decoded
coordinates + fused decode consistency).

The engine is the beyond-parity serving story: the reference's
predictor/exporter are empty files (SURVEY.md §2.11); its CUDA
ecosystem would get this recipe from TensorRT PTQ.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpupose.models.simple_baseline import SimpleBaseline
from tpupose.ops.int8_engine import (Int8Engine, fold_simple_baseline,
                                     folded_fp32_forward)
from tpupose.ops.preprocess import (IMAGENET_MEAN, IMAGENET_STD,
                                    normalize_images)


def _init(backbone="resnet18", hw=(64, 48), k=17, seed=0):
    model = SimpleBaseline(backbone=backbone, num_keypoints=k,
                           dtype=jnp.float32)
    x = jnp.zeros((1, *hw, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), x, train=False)
    return model, variables


def test_stem_int8_input_is_exact():
    """uint8 - 128 in int8 loses nothing; with the folded per-channel
    scale/shift it reproduces normalize_images exactly (interior pixels)."""
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    ref = np.asarray(normalize_images(jnp.asarray(imgs), dtype=jnp.float32))
    xi = imgs.astype(np.int32) - 128          # the engine's int8 value
    alpha = 1.0 / (255.0 * np.asarray(IMAGENET_STD))
    beta = (128.0 / 255.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(
        IMAGENET_STD)
    rec = xi * alpha + beta
    np.testing.assert_allclose(rec, ref, atol=1e-6)


@pytest.mark.parametrize("backbone,n_blocks", [("resnet18", 8),
                                               ("resnet50", 16)])
@pytest.mark.slow
def test_fold_walk_covers_whole_network(backbone, n_blocks):
    _, variables = _init(backbone, hw=(64, 48), k=4)
    nodes, weights, stem_pad, in_pad = fold_simple_baseline(variables,
                                                            backbone)
    kinds = [nd.kind for nd in nodes]
    # stem conv, maxpool, then per-block conv+add groups, 3 deconvs, final
    assert kinds[0] == "conv" and kinds[1] == "maxpool"
    assert kinds.count("add") == n_blocks
    assert stem_pad.dtype == np.int8 and stem_pad.shape == (3,)
    assert in_pad == (3, 3)
    # every conv spec resolves to folded weights; final is the only fp32 out
    names = {nd.spec.name for nd in nodes if nd.kind == "conv"}
    assert names == set(weights)
    fp32_outs = [nd for nd in nodes if nd.kind == "conv" and not nd.quant]
    assert len(fp32_outs) == 1 and fp32_outs[0].spec.name == "final"
    # graph is topologically ordered: every input is already defined
    seen = {"in"}
    for nd in nodes:
        assert all(i in seen for i in nd.inputs)
        seen.add(nd.out)


def test_defer_requant_targets_residual_branches():
    """The round-3 graph pass: every conv whose only consumer is a
    residual add loses its requant (round/clip/cast) and stays fp32 for
    XLA to fuse into the add; everything else is untouched."""
    from tpupose.ops.int8_engine import _defer_requant, _scale_map

    _, variables = _init("resnet18", hw=(64, 48), k=4)
    nodes, _, _, _ = fold_simple_baseline(variables, "resnet18")
    out = _defer_requant(nodes)
    flipped = [b for a, b in zip(nodes, out) if a.quant != b.quant]
    # resnet18: 8 basic blocks (conv2 of each) + 3 stage downsamples
    assert len(flipped) == 11
    assert all(nd.kind == "conv" and not nd.quant for nd in flipped)
    # the final heatmap conv stays the only OTHER unquantized conv
    fp32_convs = [nd for nd in out if nd.kind == "conv" and not nd.quant]
    assert len(fp32_convs) == 12

    # scale bookkeeping: every deferred conv resolves to its add's scale
    n_q = sum(1 for nd in out if nd.quant and nd.kind in ("conv", "add"))
    tmap, deferred = _scale_map(out, list(range(1, n_q + 1)))
    assert len(deferred) == 11
    consumers = {}
    for nd in out:
        for nm in nd.inputs:
            consumers.setdefault(nm, []).append(nd)
    for name, t in deferred.items():
        (add,) = consumers[name]
        assert add.kind == "add" and tmap[add.out] == t


def test_folded_fp32_matches_model_apply():
    """BN folding + normalize folding reproduce the unfolded model. The
    only deviation is the stem border: int8 padding quantizes the
    normalized-zero pixel to the nearest of 256 levels."""
    model, variables = _init("resnet18")
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, (2, 64, 48, 3)).astype(np.uint8)
    ref = np.asarray(model.apply(variables, normalize_images(
        jnp.asarray(imgs)), train=False))
    fold = np.asarray(folded_fp32_forward(variables, "resnet18")(imgs))
    denom = np.abs(ref).max()
    assert np.abs(fold - ref).max() / denom < 0.02
    c = np.corrcoef(ref.ravel(), fold.ravel())[0, 1]
    assert c > 0.999


@pytest.mark.slow
def test_hrnet_fold_matches_model_apply():
    """The HRNet DAG walk (multi-branch stages, fuse sums, nearest
    upsampling, flax auto-numbering mirror) reproduces HRNetPose."""
    from tpupose.models.backbones.hrnet import HRNetPose

    model = HRNetPose(variant="hrnet_w18", num_keypoints=4,
                      dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    ref = np.asarray(model.apply(variables, normalize_images(
        jnp.asarray(imgs)), train=False))
    fold = np.asarray(folded_fp32_forward(variables, "hrnet_w18")(imgs))
    assert fold.shape == ref.shape
    denom = np.abs(ref).max()
    assert np.abs(fold - ref).max() / denom < 0.03
    c = np.corrcoef(ref.ravel(), fold.ravel())[0, 1]
    assert c > 0.999


@pytest.mark.slow
def test_hrnet_fold_odd_input_size():
    """Non-32-divisible inputs: ceil-division branch resolutions make the
    fuse upsample ratios non-integer; the engine must take the same
    nearest-resize fallback as the model's _upsample_to instead of
    crashing on a fixed 2**(j-i) factor."""
    from tpupose.models.backbones.hrnet import HRNetPose

    model = HRNetPose(variant="hrnet_w18", num_keypoints=4,
                      dtype=jnp.float32)
    x = jnp.zeros((1, 100, 100, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    rng = np.random.RandomState(4)
    imgs = rng.randint(0, 256, (2, 100, 100, 3)).astype(np.uint8)
    ref = np.asarray(model.apply(variables, normalize_images(
        jnp.asarray(imgs)), train=False))
    fold = np.asarray(folded_fp32_forward(variables, "hrnet_w18")(imgs))
    assert fold.shape == ref.shape
    denom = np.abs(ref).max()
    assert np.abs(fold - ref).max() / denom < 0.03


def test_unsupported_backbone_is_a_clear_error():
    with pytest.raises(ValueError, match="SimpleBaseline"):
        Int8Engine.build({"params": {}}, backbone="convnext_tiny",
                         calib=[np.zeros((1, 32, 32, 3), np.uint8)])


def test_stem_rounds_float_pixels():
    """fp32 pixels round to the nearest integer (matching the fp32
    path's value), never truncate toward zero."""
    from tpupose.ops.int8_engine import _stem_int8

    imgs = jnp.asarray([[[[254.9, 0.4, 127.5]]]], jnp.float32)
    out = np.asarray(_stem_int8(imgs, np.zeros(3, np.int8), (0, 0)))
    assert out[0, 0, 0, 0] == 255 - 128
    assert out[0, 0, 0, 1] == 0 - 128


@pytest.mark.slow
def test_hrnet_int8_engine_runs():
    """End-to-end int8 serving of the HRNet DAG: finite heatmaps that
    track fp32."""
    from tpupose.models.backbones.hrnet import HRNetPose

    model = HRNetPose(variant="hrnet_w18", num_keypoints=4,
                      dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)

    eng = Int8Engine.build(variables, backbone="hrnet_w18", calib=imgs)
    hm_q = np.asarray(eng(imgs))
    hm_f = np.asarray(model.apply(variables, normalize_images(
        jnp.asarray(imgs)), train=False))
    assert hm_q.shape == hm_f.shape
    assert np.isfinite(hm_q).all()
    c = np.corrcoef(hm_f.ravel(), hm_q.ravel())[0, 1]
    assert c > 0.95


@pytest.mark.slow
def test_int8_engine_tracks_fp32_end_to_end():
    """Full engine: int8 activations end-to-end still track the fp32
    model — high heatmap correlation, decoded keypoints within a pixel,
    and the fused decode() agrees with decoding the engine's heatmaps."""
    from tpupose.ops.decode import decode_heatmaps

    model, variables = _init("resnet18", hw=(64, 64), k=4)
    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 256, (4, 64, 64, 3)).astype(np.uint8)
    calib = rng.randint(0, 256, (4, 64, 64, 3)).astype(np.uint8)

    eng = Int8Engine.build(variables, backbone="resnet18", calib=[calib])
    hm_q = np.asarray(eng(imgs))
    hm_f = np.asarray(model.apply(variables, normalize_images(
        jnp.asarray(imgs)), train=False))
    assert hm_q.shape == hm_f.shape
    c = np.corrcoef(hm_f.ravel(), hm_q.ravel())[0, 1]
    assert c > 0.98

    cq, sq = map(np.asarray, eng.decode(imgs))
    cf, _ = map(np.asarray, decode_heatmaps(
        jnp.transpose(jnp.asarray(hm_f), (0, 3, 1, 2)), method="dark"))
    # random-init heatmaps are nearly flat, so a few argmax flips are
    # expected; most joints must land within ~1 heatmap pixel
    d = np.linalg.norm(cq - cf, axis=-1)
    assert (d <= 1.5).mean() > 0.7

    # fused decode == decode of the engine's own heatmaps (exactly)
    c2, s2 = decode_heatmaps(jnp.transpose(jnp.asarray(hm_q), (0, 3, 1, 2)),
                             method="dark")
    np.testing.assert_allclose(cq, np.asarray(c2), atol=1e-5)
    np.testing.assert_allclose(sq, np.asarray(s2), atol=1e-5)


@pytest.mark.slow
def test_evaluator_serves_through_engine():
    """TopDownEvaluator(int8_engine=...) runs the fused flip+merge+DARK
    program around the int8 graph and lands near the fp32 evaluator."""
    import optax

    from tpupose.engine.evaluator import TopDownEvaluator
    from tpupose.engine.train_state import create_train_state

    model, variables = _init("resnet18", hw=(64, 64), k=4)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), optax.sgd(0.0))
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
    rng = np.random.RandomState(5)
    imgs = rng.randint(0, 256, (4, 64, 64, 3)).astype(np.uint8)
    centers = np.tile([[32.0, 32.0]], (4, 1)).astype(np.float32)
    scales = np.tile([[64.0, 64.0]], (4, 1)).astype(np.float32)
    pairs = np.zeros((0, 2), np.int64)

    ev = TopDownEvaluator(state, (16, 16), decode="dark", flip_test=True,
                          flip_pairs=pairs)
    eng = Int8Engine.build(variables, backbone="resnet18", calib=imgs)
    ev_e = TopDownEvaluator(state, (16, 16), decode="dark", flip_test=True,
                            flip_pairs=pairs, int8_engine=eng)

    cf, sf = map(np.asarray, ev._step(state, imgs, centers, scales))
    cq, sq = map(np.asarray, ev_e._step(state, imgs, centers, scales))
    assert cq.shape == cf.shape and sq.shape == sf.shape
    # source coords: 64px image -> most joints within ~2 px of fp32
    d = np.linalg.norm(cq - cf, axis=-1)
    assert (d <= 2.0).mean() > 0.7
    assert np.abs(sq - sf).max() < 0.05


@pytest.mark.slow
def test_predictor_serves_through_engine():
    """HeatmapPredictor(int8_engine=...) is the serving-API twin of the
    evaluator wiring: identical outputs for the same engine + inputs."""
    import optax

    from tpupose.engine.evaluator import TopDownEvaluator
    from tpupose.engine.predictor import HeatmapPredictor
    from tpupose.engine.train_state import create_train_state

    model, variables = _init("resnet18", hw=(64, 64), k=4)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), optax.sgd(0.0))
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
    rng = np.random.RandomState(7)
    imgs = rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    pairs = np.zeros((0, 2), np.int64)

    eng = Int8Engine.build(variables, backbone="resnet18", calib=imgs)
    pred = HeatmapPredictor(state, (16, 16), decode="dark", flip_test=False,
                            flip_pairs=pairs, int8_engine=eng)
    ev = TopDownEvaluator(state, (16, 16), decode="dark", flip_test=False,
                          flip_pairs=pairs, int8_engine=eng)
    centers = np.tile([[32.0, 32.0]], (2, 1)).astype(np.float32)
    scales = np.tile([[64.0, 64.0]], (2, 1)).astype(np.float32)
    cp, sp = map(np.asarray, pred(imgs, centers, scales))
    ce, se = map(np.asarray, ev._step(state, imgs, centers, scales))
    np.testing.assert_allclose(cp, ce, atol=1e-5)
    np.testing.assert_allclose(sp, se, atol=1e-6)


@pytest.mark.slow
def test_engine_accepts_trained_variables_resnet50():
    """The graph walk serves a resnet50 tree (bottleneck path + projection
    shortcuts) without shape errors and produces finite heatmaps."""
    model, variables = _init("resnet50", hw=(64, 48), k=4)
    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 256, (2, 64, 48, 3)).astype(np.uint8)
    ref = model.apply(variables, normalize_images(jnp.asarray(imgs)),
                      train=False)
    eng = Int8Engine.build(variables, backbone="resnet50", calib=imgs)
    hm = np.asarray(eng(imgs))
    assert hm.shape == ref.shape
    assert np.isfinite(hm).all()
