"""Bottom-up AE family: multi-person targets, push/pull loss values,
grouping decode correctness, train-step learning, Trainer wiring."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_multi_person_heatmaps_max_composition():
    """Two instances with the same joint type: the target is the max of
    the two Gaussians, peaking at both locations."""
    from tpupose.losses.ae import multi_person_heatmaps

    K, H, W = 1, 32, 32
    kpts = np.zeros((1, 2, K, 3), np.float32)
    kpts[0, 0, 0] = (8 / W, 8 / H, 2)
    kpts[0, 1, 0] = (24 / W, 24 / H, 2)
    mask = np.ones((1, 2), np.float32)
    t = np.asarray(multi_person_heatmaps(jnp.asarray(kpts),
                                         jnp.asarray(mask), (H, W)))
    assert t.shape == (1, H, W, K)
    np.testing.assert_allclose(t[0, 8, 8, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(t[0, 24, 24, 0], 1.0, atol=1e-5)
    # masked-out instance contributes nothing
    mask2 = np.array([[1.0, 0.0]], np.float32)
    t2 = np.asarray(multi_person_heatmaps(jnp.asarray(kpts),
                                          jnp.asarray(mask2), (H, W)))
    assert t2[0, 24, 24, 0] < 0.1


def test_ae_grouping_loss_hand_computed():
    """Constant per-person tags -> pull = 0; push = exp(-d^2/2) between
    the two person means."""
    from tpupose.losses.ae import ae_grouping_loss

    H = W = 8
    K, M = 2, 2
    tags = np.zeros((1, H, W, K), np.float32)
    # person 0 joints at (1,1),(2,2) tag 0; person 1 at (5,5),(6,6) tag 3
    tags[0, 1, 1, 0] = 0.0
    tags[0, 2, 2, 1] = 0.0
    tags[0, 5, 5, 0] = 3.0
    tags[0, 6, 6, 1] = 3.0
    kpts = np.zeros((1, M, K, 3), np.float32)
    kpts[0, 0, 0] = (1 / W, 1 / H, 2)
    kpts[0, 0, 1] = (2 / W, 2 / H, 2)
    kpts[0, 1, 0] = (5 / W, 5 / H, 2)
    kpts[0, 1, 1] = (6 / W, 6 / H, 2)
    mask = np.ones((1, M), np.float32)
    pull, push = ae_grouping_loss(jnp.asarray(tags), jnp.asarray(kpts),
                                  jnp.asarray(mask))
    np.testing.assert_allclose(float(pull), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(push), math.exp(-9.0 / 2.0), rtol=1e-5)
    # identical tags -> maximal push (= 1), nonzero only between persons
    pull2, push2 = ae_grouping_loss(jnp.zeros((1, H, W, K)),
                                    jnp.asarray(kpts), jnp.asarray(mask))
    np.testing.assert_allclose(float(push2), 1.0, atol=1e-6)


def test_ae_loss_excludes_padded_rows():
    """Trainer.validate's pad_last contract: a duplicate row with a zeroed
    instance_mask must contribute NOTHING to the loss — same prediction,
    same loss, regardless of how many padded rows ride along."""
    from tpupose.losses.ae import ae_loss

    K, H, W, M = 2, 16, 16, 3
    rng = np.random.RandomState(0)
    kpts = np.zeros((1, M, K, 3), np.float32)
    kpts[0, 0, :, :2] = rng.uniform(0.2, 0.8, (K, 2))
    kpts[0, 0, :, 2] = 2
    mask1 = np.zeros((1, M), np.float32)
    mask1[0, 0] = 1
    pred1 = rng.uniform(0, 1, (1, H, W, 2 * K)).astype(np.float32)

    loss1, _ = ae_loss(jnp.asarray(pred1), jnp.asarray(kpts),
                       jnp.asarray(mask1))
    # append the SAME image as a padded duplicate (mask all-zero)
    pred2 = np.concatenate([pred1, pred1], 0)
    kpts2 = np.concatenate([kpts, kpts], 0)
    mask2 = np.concatenate([mask1, np.zeros((1, M), np.float32)], 0)
    loss2, _ = ae_loss(jnp.asarray(pred2), jnp.asarray(kpts2),
                       jnp.asarray(mask2))
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)


def test_gather_tags_excludes_offmap_joints():
    """A visible joint whose pixel falls outside the map must not pull a
    clamped border tag into the person mean (mirrors the heatmap target's
    off-map weight mask)."""
    from tpupose.losses.ae import gather_tags

    K, H, W = 1, 8, 8
    tags = np.full((1, H, W, K), 7.0, np.float32)
    kpts = np.zeros((1, 1, K, 3), np.float32)
    kpts[0, 0, 0] = (1.5, 0.5, 2)      # x = 1.5 * W = 12 -> off-map
    mask = np.ones((1, 1), np.float32)
    _, valid = gather_tags(jnp.asarray(tags), jnp.asarray(kpts),
                           jnp.asarray(mask))
    assert float(valid[0, 0, 0]) == 0.0


def test_decode_ae_plateau_tie_single_person():
    """An exact 2-pixel plateau (int8-quantized maps make these common)
    must decode as ONE person, not one duplicate per tied pixel."""
    from tpupose.ops.ae_decode import decode_ae

    K, H, W = 1, 16, 16
    hm = np.zeros((1, K, H, W), np.float32)
    hm[0, 0, 10, 10] = 1.0
    hm[0, 0, 10, 11] = 1.0                 # exact tie, same 3x3 window
    tagm = np.zeros((1, K, H, W), np.float32)
    out = decode_ae(jnp.asarray(hm), jnp.asarray(tagm), max_people=4,
                    refine=False)
    assert int(np.asarray(out["person_mask"]).sum()) == 1


def test_decode_ae_groups_two_people():
    """Perfect heatmaps + well-separated tags -> decode recovers both
    instances with the right joint assignments."""
    from tpupose.ops.ae_decode import decode_ae

    K, H, W = 3, 48, 48
    people = [  # (joints, tag)
        ([(10, 12), (14, 16), (12, 20)], -2.0),
        ([(30, 30), (34, 34), (32, 40)], 2.0),
    ]
    hm = np.zeros((1, K, H, W), np.float32)
    tg = np.zeros((1, K, H, W), np.float32)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    for joints, tag in people:
        for k, (x, y) in enumerate(joints):
            g = np.exp(-((xs - x) ** 2 + (ys - y) ** 2) / 8.0)
            hm[0, k] = np.maximum(hm[0, k], g)
            tg[0, k][g > 0.5] = tag
    out = jax.device_get(decode_ae(jnp.asarray(hm), jnp.asarray(tg),
                                   max_people=4, tag_threshold=1.0))
    assert out["person_mask"][0].sum() == 2
    got = []
    for p in range(4):
        if out["person_mask"][0, p]:
            got.append([tuple(np.round(out["coords"][0, p, k]).astype(int))
                        for k in range(K)])
    want = [[(x, y) for x, y in joints] for joints, _ in people]
    assert sorted(got) == sorted(want)
    # all joints scored near 1
    ps = out["person_scores"][0][out["person_mask"][0]]
    assert (ps > 0.9).all()


def test_decode_ae_single_person_no_spurious_groups():
    from tpupose.ops.ae_decode import decode_ae

    K, H, W = 2, 32, 32
    hm = np.zeros((1, K, H, W), np.float32)
    tg = np.zeros((1, K, H, W), np.float32)
    hm[0, 0, 10, 10] = 1.0
    hm[0, 1, 15, 15] = 1.0
    out = jax.device_get(decode_ae(jnp.asarray(hm), jnp.asarray(tg),
                                   max_people=6))
    assert out["person_mask"][0].sum() == 1
    assert tuple(out["coords"][0, 0, 0]) == (10.0, 10.0)
    assert tuple(out["coords"][0, 0, 1]) == (15.0, 15.0)


@pytest.mark.slow
def test_bottom_up_train_step_learns():
    import optax

    from tpupose.engine.train_state import (create_train_state,
                                            make_bottom_up_train_step)
    from tpupose.losses.ae import ae_loss
    from tpupose.models.bottom_up import BottomUpPose

    m = BottomUpPose(backbone="resnet18", num_keypoints=3,
                     deconv_channels=(64, 64, 64), dtype=jnp.float32)
    rng = np.random.RandomState(0)
    B, M, K = 2, 4, 3
    kpts = np.zeros((B, M, K, 3), np.float32)
    kpts[..., :2] = rng.uniform(0.2, 0.8, (B, M, K, 2))
    kpts[..., 2] = 2.0
    mask = np.zeros((B, M), np.float32)
    mask[:, :2] = 1.0
    batch = {
        "images": rng.randint(0, 255, (B, 64, 64, 3)).astype(np.uint8),
        "keypoints": jnp.asarray(kpts),
        "instance_mask": jnp.asarray(mask),
    }
    import functools

    loss_fn = functools.partial(ae_loss, sigma=1.5)
    state = create_train_state(m, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), optax.adam(1e-3))
    step = make_bottom_up_train_step(loss_fn)
    losses = []
    for _ in range(12):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]
    assert {"hm_loss", "pull", "push"} <= set(metrics)


@pytest.mark.slow
def test_bottom_up_trainer_wiring(tmp_path):
    from tpupose.configs.default import default_config
    from tpupose.engine.trainer import Trainer

    cfg = default_config()
    cfg.model.name = "bottom_up"
    cfg.model.backbone = "resnet18"
    cfg.model.num_keypoints = 4
    cfg.model.deconv_channels = (64, 64, 64)
    cfg.model.heatmap_size = (16, 16)
    cfg.data.name = "synthetic_yolo"
    cfg.data.image_size = (64, 64)
    cfg.data.max_instances = 8
    cfg.train.batch_size = 8
    cfg.train.warmup_epochs = 0
    cfg.train.mixed_precision = False
    cfg.train.log_interval = 100
    cfg.train.output_dir = str(tmp_path)
    cfg.loss.name = "ae"
    cfg.optimizer.name = "adam"
    cfg.optimizer.lr = 1e-3
    cfg.eval.metrics = ("oks_ap",)

    tr = Trainer(cfg)
    assert tr.family == "bottom_up"
    l0 = tr.iter_one_epoch(0)
    l1 = tr.iter_one_epoch(1)
    assert np.isfinite(l1) and l1 < l0
    v = tr.validate()
    assert np.isfinite(v)
    out = tr.evaluate()
    assert "map" in {k.lower() for k in out} or any(
        "ap" in k.lower() for k in out)


def test_bottom_up_predictor_end_to_end():
    """BottomUpPredictor: trunk forward + grouping in one program, coords
    scaled back to input pixels."""
    import optax

    from tpupose.engine.predictor import BottomUpPredictor
    from tpupose.engine.train_state import create_train_state
    from tpupose.models.bottom_up import BottomUpPose

    m = BottomUpPose(backbone="resnet18", num_keypoints=2,
                     deconv_channels=(32, 32, 32), dtype=jnp.float32)
    state = create_train_state(m, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), optax.sgd(0.0))
    pred = BottomUpPredictor(state, max_people=4, score_threshold=-1e9)
    out = pred(np.zeros((2, 64, 64, 3), np.uint8))
    assert out["coords"].shape == (2, 4, 2, 2)
    assert out["scores"].shape == (2, 4, 2)
    assert out["person_mask"].shape == (2, 4)
    # coords are in input pixels (4x the 16x16 grid)
    assert float(out["coords"].max()) <= 64.0


def test_decode_ae_quarter_offset_refine():
    """An asymmetric peak (higher right neighbor) shifts +0.25 px toward
    it; a symmetric peak does not move."""
    from tpupose.ops.ae_decode import decode_ae

    hm = np.zeros((1, 1, 16, 16), np.float32)
    tg = np.zeros((1, 1, 16, 16), np.float32)
    hm[0, 0, 8, 8] = 1.0
    hm[0, 0, 8, 9] = 0.6   # right neighbor higher than left (0)
    hm[0, 0, 7, 8] = 0.3
    hm[0, 0, 9, 8] = 0.3   # vertical symmetric
    out = jax.device_get(decode_ae(jnp.asarray(hm), jnp.asarray(tg),
                                   max_people=2))
    np.testing.assert_allclose(out["coords"][0, 0, 0], [8.25, 8.0])
    out2 = jax.device_get(decode_ae(jnp.asarray(hm), jnp.asarray(tg),
                                    max_people=2, refine=False))
    np.testing.assert_allclose(out2["coords"][0, 0, 0], [8.0, 8.0])


def test_bottom_up_predictor_flip_test():
    """flip_test path compiles and, for mirror-symmetric input + no
    pairs, changes nothing structurally (shapes, mask dtype)."""
    import optax

    from tpupose.engine.predictor import BottomUpPredictor
    from tpupose.engine.train_state import create_train_state
    from tpupose.models.bottom_up import BottomUpPose

    m = BottomUpPose(backbone="resnet18", num_keypoints=2,
                     deconv_channels=(32, 32, 32), dtype=jnp.float32)
    state = create_train_state(m, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), optax.sgd(0.0))
    pred = BottomUpPredictor(state, max_people=3, flip_test=True,
                             flip_pairs=np.array([[0, 1]]))
    out = pred(np.zeros((1, 64, 64, 3), np.uint8))
    assert out["coords"].shape == (1, 3, 2, 2)
    assert out["person_mask"].dtype == bool


@pytest.mark.slow
def test_bottom_up_training_localizes_and_groups():
    """The full objective learns real multi-person localization, not just
    loss descent: after a few hundred memorization steps on two fixed
    batches, AE-grouped decode scores well above chance on OKS-AP.

    Lenient OKS sigmas are used because the toy persons span only
    ~10-18 px (area ~150 px^2): with the COCO sigmas a single heatmap
    cell of quantization error (4 input px at stride 4) already drives
    OKS to ~0, so chance and perfect predictions would be
    indistinguishable at this scale.
    """
    import functools

    import optax

    from tpupose.engine.train_state import (create_train_state,
                                            make_bottom_up_train_step)
    from tpupose.losses.ae import ae_loss
    from tpupose.metrics.oks_ap import OKSAP
    from tpupose.models.bottom_up import BottomUpPose
    from tpupose.ops.ae_decode import decode_ae
    from tpupose.ops.preprocess import normalize_images

    rng = np.random.RandomState(0)
    B, M, K, S = 8, 2, 2, 64
    ys, xs = np.mgrid[0:S, 0:S].astype(np.float32)

    def make_batch(seed):
        r = np.random.RandomState(seed)
        imgs = np.zeros((B, S, S, 3), np.float32)
        kpts = np.zeros((B, M, K, 3), np.float32)
        for b in range(B):
            # two persons in opposite halves: separable by location-
            # correlated tags
            for m_, x0 in enumerate((0.25, 0.75)):
                cx = np.clip(x0 + r.uniform(-0.1, 0.1), 0.15, 0.85)
                cy = r.uniform(0.3, 0.7)
                for k in range(K):
                    kx = np.clip(cx + r.uniform(-0.08, 0.08), 0.02, 0.98)
                    ky = np.clip(cy + r.uniform(-0.08, 0.08), 0.02, 0.98)
                    kpts[b, m_, k] = (kx, ky, 2.0)
                    d2 = (xs - kx * S) ** 2 + (ys - ky * S) ** 2
                    imgs[b, :, :, k] += 255.0 * np.exp(-d2 / 18.0)
        return {"images": np.clip(imgs, 0, 255).astype(np.uint8),
                "keypoints": jnp.asarray(kpts),
                "instance_mask": jnp.ones((B, M), jnp.float32)}

    batches = [make_batch(1), make_batch(2)]
    model = BottomUpPose(backbone="resnet18", num_keypoints=K,
                         deconv_channels=(64, 64, 64), dtype=jnp.float32)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)),
        optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2e-3)))
    step = make_bottom_up_train_step(functools.partial(ae_loss, sigma=1.5))
    for it in range(180):
        state, met = step(state, batches[it % 2])
    assert np.isfinite(float(met["loss"]))

    @jax.jit
    def dec(state, images):
        pred = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            normalize_images(images), train=False)
        hm, tg = BottomUpPose.split(pred)
        return decode_ae(hm, tg, max_people=M)

    ap = OKSAP(num_classes=1, sigmas=np.full(K, 0.5, np.float32))
    for b in batches:
        out = jax.device_get(dec(state, jnp.asarray(b["images"])))
        kp = np.asarray(b["keypoints"])
        for i in range(B):
            gt = kp[i, :, :, :2] * S
            vis = kp[i, :, :, 2]
            span = gt.max(axis=1) - gt.min(axis=1)
            ap.update(out["coords"][i] * (S / 16.0),
                      out["person_scores"][i], gt, vis,
                      np.maximum(span[:, 0] * span[:, 1], 1.0),
                      pred_valid=np.asarray(out["person_mask"][i]))
    res = ap.compute()
    assert res["mAP50"] > 0.3, res


@pytest.mark.slow
def test_sigterm_saves_resumable_checkpoint(tmp_path):
    """SIGTERM inside train()'s signal guard saves a checkpoint before
    exit (preemption recovery, SURVEY.md §5.3)."""
    import os as _os
    import signal as _signal

    from tpupose.configs.default import default_config
    from tpupose.engine.trainer import Trainer

    cfg = default_config()
    cfg.model.name = "deeppose"
    cfg.model.backbone = "resnet18"
    cfg.model.num_keypoints = 2
    cfg.model.heatmap_size = (16, 16)
    cfg.data.name = "synthetic"
    cfg.data.image_size = (32, 32)
    cfg.train.batch_size = 8
    cfg.train.mixed_precision = False
    cfg.train.output_dir = str(tmp_path)
    cfg.loss.name = "coord_mse"

    tr = Trainer(cfg)
    # the handler DEFERS (the train step donates state buffers, so the
    # save must wait for a step boundary); _check_exit_signal is the
    # boundary hook the train loop calls after every step
    with pytest.raises(SystemExit) as exc:
        with tr._checkpoint_on_signal():
            _os.kill(_os.getpid(), _signal.SIGTERM)
            tr._check_exit_signal()
    assert exc.value.code == 128 + _signal.SIGTERM
    # the saved checkpoint restores
    step = tr.load_checkpoint()
    assert step == int(tr.state.step)
    # handlers restored to their previous disposition
    assert _signal.getsignal(_signal.SIGTERM) is not None
