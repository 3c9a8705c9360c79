"""FSKD episodic pipeline + FCMAE masked pretraining tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class _TinyClassDataset:
    """Base dataset for FewShotDataset: distinct mean-intensity per class."""

    def __init__(self, n_classes=6, per_class=8, K=4):
        self.samples = []
        rng = np.random.RandomState(0)
        for c in range(n_classes):
            for _ in range(per_class):
                img = np.full((32, 32, 3), 30 * c, np.uint8)
                kp = rng.uniform(0.2, 0.8, (K, 3)).astype(np.float32)
                kp[:, 2] = 2.0
                self.samples.append({"class_id": c, "image": img,
                                     "keypoints": kp})

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


def test_fewshot_dataset_episode_shapes():
    from tpupose.data.episodic import EpisodicDataLoader, FewShotDataset

    ds = FewShotDataset(_TinyClassDataset(), n_way=3, k_shot=2, n_query=4,
                        episodes_per_epoch=5)
    ep = ds[0]
    assert ep["support_images"].shape == (6, 32, 32, 3)
    assert ep["query_images"].shape == (12, 32, 32, 3)
    assert set(ep["support_labels"]) == {0, 1, 2}
    # loader stacks episodes
    dl = EpisodicDataLoader(ds, batch_size=2)
    b = next(iter(dl))
    assert b["support_images"].shape == (2, 6, 32, 32, 3)


def test_fewshot_balanced_sampling_rotates_classes():
    from tpupose.data.episodic import FewShotDataset

    ds = FewShotDataset(_TinyClassDataset(n_classes=6), n_way=3, k_shot=1,
                        n_query=1, class_sampling="balanced")
    seen = set()
    for i in range(2):
        seen.update(ds[i]["episode_classes"].tolist())
    assert len(seen) == 6  # two balanced episodes cover all 6 classes


def test_prototypes_masked_mean():
    from tpupose.models.fskd import compute_prototypes

    feats = jnp.asarray([[1.0, 0.0], [3.0, 0.0], [0.0, 5.0]])
    labels = jnp.asarray([0, 0, 1])
    p = compute_prototypes(feats, labels, 2)
    np.testing.assert_allclose(np.asarray(p), [[2.0, 0.0], [0.0, 5.0]])


@pytest.mark.slow
def test_fskd_forward_and_episode_loss():
    from tpupose.models.fskd import FSKD, fskd_episode_loss

    K = 4
    m = FSKD(n_way=3, num_keypoints=K, dim=64, vit_size="small",
             dtype=jnp.float32)
    # override the extractor size via a tiny ViT: use small but 32x32 input
    s_imgs = jnp.zeros((6, 32, 32, 3))
    q_imgs = jnp.zeros((9, 32, 32, 3))
    s_lbl = jnp.asarray([0, 0, 1, 1, 2, 2])
    v = m.init(jax.random.PRNGKey(0), s_imgs, s_lbl, q_imgs, train=False)
    out = m.apply(v, s_imgs, s_lbl, q_imgs, train=False)
    assert out["logits"].shape == (9, 3)
    assert out["keypoints"].shape == (9, K, 2)
    assert out["confidence"].shape == (9, K)
    q_lbl = jnp.asarray([0, 1, 2] * 3)
    q_kpts = jnp.full((9, K, 2), 0.5)
    q_vis = jnp.full((9, K), 2.0)
    loss, parts = fskd_episode_loss(out, q_lbl, q_kpts, q_vis)
    assert np.isfinite(float(loss))
    assert set(parts) == {"cls", "kpt", "conf"}


@pytest.mark.slow
def test_maml_adapt_reduces_support_loss():
    from tpupose.models.fskd import FSKD, fskd_episode_loss, maml_adapt

    K = 2
    m = FSKD(n_way=2, num_keypoints=K, dim=32, vit_size="small",
             dtype=jnp.float32)
    rng = np.random.RandomState(0)
    s_imgs = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 3)), jnp.float32)
    s_lbl = jnp.asarray([0, 0, 1, 1])
    s_kpts = jnp.full((4, K, 2), 0.5)
    s_vis = jnp.full((4, K), 2.0)
    v = m.init(jax.random.PRNGKey(0), s_imgs, s_lbl, s_imgs, train=False)

    def sup_loss(variables):
        out = m.apply(variables, s_imgs, s_lbl, s_imgs, train=False)
        return float(fskd_episode_loss(out, s_lbl, s_kpts, s_vis)[0])

    before = sup_loss(v)
    v2 = maml_adapt(m, v, s_imgs, s_lbl, s_kpts, s_vis,
                    inner_lr=0.001, inner_steps=2)
    after = sup_loss(v2)
    assert after < before


@pytest.mark.slow
def test_fcmae_mask_and_loss():
    from tpupose.models.fcmae import FCMAE, gen_random_mask, patchify

    mask = gen_random_mask(jax.random.PRNGKey(0), 2, 16, 0.5)
    assert mask.shape == (2, 16)
    np.testing.assert_allclose(np.asarray(mask.sum(1)), [8, 8])

    x = jnp.asarray(np.random.RandomState(0).uniform(0, 1, (2, 64, 64, 3)),
                    jnp.float32)
    p = patchify(x, 32)
    assert p.shape == (2, 4, 32 * 32 * 3)

    m = FCMAE(size="atto", patch_size=32, mask_ratio=0.5, decoder_dim=64,
              dtype=jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
               x, train=False)
    loss, out = m.apply(v, x, train=False,
                        rngs={"mask": jax.random.PRNGKey(2)})
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert out["pred"].shape == (2, 4, 32 * 32 * 3)


@pytest.mark.slow
def test_fcmae_grads_only_through_visible_encoder():
    """Masked patches contribute loss only through the decoder/mask token —
    the encoder's masked activations are zeroed (masked-dense invariant)."""
    from tpupose.models.fcmae import FCMAE

    x = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.5
    m = FCMAE(size="atto", patch_size=32, mask_ratio=0.5, decoder_dim=32,
              dtype=jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
               x, train=False)
    mask = jnp.asarray([[1.0, 0.0, 0.0, 1.0]])

    def f(img):
        loss, _ = m.apply(v, img, mask=mask, train=False)
        return loss

    g = np.asarray(jax.grad(f)(x))
    assert np.isfinite(g).all()
