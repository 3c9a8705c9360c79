"""Regression tests for the round-2 review findings: visit-keyed
augmentation rng (thread-order independent), pad-masked validate(), and
the checkpoint legacy-layout fallback."""

import json
import os

import numpy as np
import pytest
from PIL import Image


def _make_coco(root, n=4):
    (root / "train2017").mkdir()
    (root / "annotations").mkdir()
    rng = np.random.RandomState(0)
    images, anns = [], []
    for i in range(n):
        name = f"{i:012d}.jpg"
        Image.fromarray(rng.randint(0, 255, (120, 100, 3)).astype(np.uint8)
                        ).save(root / "train2017" / name)
        images.append({"id": i, "file_name": name, "width": 100, "height": 120})
        kp = []
        for k in range(17):
            kp += [float(20 + 3 * k % 60), float(20 + 5 * k % 80), 2]
        anns.append({"id": i, "image_id": i, "category_id": 1,
                     "bbox": [10, 10, 70, 100], "keypoints": kp,
                     "num_keypoints": 17, "area": 7000, "iscrowd": 0})
    with open(root / "annotations" / "person_keypoints_train2017.json",
              "w") as f:
        json.dump({"images": images, "annotations": anns}, f)


def test_augmentation_independent_of_visit_order(tmp_path):
    """Two datasets visited in DIFFERENT index orders draw identical
    augmentation parameters per sample (seeded per (seed, idx, visit),
    not from a shared sequential stream)."""
    from tpupose.data.coco import CocoTopDownDataset

    _make_coco(tmp_path)
    kw = dict(image_dir=str(tmp_path / "train2017"),
              ann_file=str(tmp_path / "annotations" /
                           "person_keypoints_train2017.json"),
              image_size=(64, 64), heatmap_size=(16, 16), is_train=True,
              seed=7)
    a = CocoTopDownDataset(**kw)
    b = CocoTopDownDataset(**kw)
    pa = {i: a._sample_params(i) for i in [0, 1, 2, 3]}
    pb = {i: b._sample_params(i) for i in [3, 1, 0, 2]}  # different order
    for i in range(4):
        (_, ca, sa, ra, fa, ja, va) = pa[i]
        (_, cb, sb, rb, fb, jb, vb) = pb[i]
        np.testing.assert_allclose(ca, cb)
        np.testing.assert_allclose(sa, sb)
        assert ra == rb and fa == fb
        np.testing.assert_allclose(ja, jb)
    # second visit of the same index draws NEW params (per-epoch variety)
    (_, _, s2, _, _, _, _) = a._sample_params(0)
    assert not np.allclose(s2, pa[0][2]) or a._sample_params(0)[3] != pa[0][3]


def _tiny_trainer(tmp_path, eval_bs):
    from tpupose.configs.default import Config
    from tpupose.engine.trainer import Trainer

    cfg = Config()
    cfg.model.name = "simple_baseline"
    cfg.model.backbone = "resnet18"
    cfg.model.num_keypoints = 4
    cfg.model.heatmap_size = [16, 16]
    cfg.data.name = "synthetic"
    cfg.data.image_size = [64, 64]
    cfg.train.batch_size = 8
    cfg.train.mixed_precision = False
    cfg.train.output_dir = str(tmp_path / f"out{eval_bs}")
    cfg.eval.batch_size = eval_bs
    return Trainer(cfg)


@pytest.mark.slow
def test_validate_invariant_to_tail_padding(tmp_path):
    """The synthetic valid split has 64 samples; batch 48 forces a padded
    tail (48 + 16pad->48). Masked validate() must agree with the evenly
    divisible batching within float tolerance."""
    t1 = _tiny_trainer(tmp_path, 32)   # 64 = 2 x 32, no padding
    v1 = t1.validate()
    t2 = _tiny_trainer(tmp_path, 48)   # tail of 16 padded to 48
    v2 = t2.validate()
    assert v1 == pytest.approx(v2, rel=1e-4)


def test_checkpoint_legacy_flat_layout_restores(tmp_path):
    """Checkpoints written by the pre-split manager (steps directly under
    the directory) still restore instead of silently returning init."""
    import jax
    import jax.numpy as jnp
    import optax
    import orbax.checkpoint as ocp

    from tpupose.engine.checkpoint import CheckpointManager
    from tpupose.engine.train_state import create_train_state
    from tpupose.models.heads import ClassifyHead

    model = ClassifyHead(num_classes=3)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 8, 8, 4)), optax.sgd(0.1))
    # write a legacy flat-layout checkpoint at step 5
    tree = {"step": jnp.asarray(5), "params": state.params,
            "batch_stats": state.batch_stats, "opt_state": state.opt_state}
    legacy = ocp.CheckpointManager(str(tmp_path / "ckpt"))
    legacy.save(5, args=ocp.args.StandardSave(tree))
    legacy.wait_until_finished()
    legacy.close()

    fresh = create_train_state(model, jax.random.PRNGKey(1),
                               jnp.zeros((1, 8, 8, 4)), optax.sgd(0.1))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    restored, step = mgr.restore(fresh)
    mgr.close()
    assert step == 5
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]))
