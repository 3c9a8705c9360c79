"""FSKD — few-shot keypoint detection subsystem.

Capability parity with the reference FSKD package
(reference: HPE/models/reference/fskd/*, ~1,650 LoC; SURVEY.md §2.4):

- FeatureExtractor (feature_extractor.py:8-117): backbone cls/patch tokens
  with multi-level CLS fusion; CrossModalFeatureExtractor (:120-198) adds
  learned modality embeddings.
- PrototypicalHead (prototypical_head.py:54-240): per-class-per-keypoint
  mean prototypes from support features, cosine-distance classification,
  offset + confidence heads. MultiPrototypicalHead (:241-360) adds a
  hierarchical (coarse class -> fine keypoint) variant.
- AttentionFusion (attention_fusion.py:7-372): cross/self/prototype-aware
  MHA fusion; AdaptiveAttentionFusion (:374-537) learns per-strategy
  mixture weights.
- FSKD top model (fskd_small.py:248-505): compute_prototypes ->
  meta_adapt -> predict; MAML-style inner-loop adaptation.

The reference subsystem is partly skeletal (placeholder losses, SURVEY.md
§3.5) — this is a complete, working implementation of the intended
capability. JAX-native: episodes are static (N-way, K-shot, Q-query)
tensors; the MAML inner loop is jax.grad over the support loss (functional
params, no model cloning).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpupose.models.attention import Attention, GatedAttention
from tpupose.models.backbones.vit import DinoViT


class FeatureExtractor(nn.Module):
    """ViT backbone -> (cls_feat, patch_feats). Fuses CLS tokens from three
    depths through an MLP (reference feature_extractor.py 3-level fusion)."""

    vit_size: str = "small"
    out_dim: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        from tpupose.models.backbones.vit import VIT_SIZES

        depth = VIT_SIZES[self.vit_size]["depth"]
        ids = (depth // 3 - 1, 2 * depth // 3 - 1, depth - 1)
        out = DinoViT.from_size(self.vit_size, intermediates=ids,
                                dtype=self.dtype)(x, train=train)
        B = x.shape[0]
        inter = out["intermediates"]
        cls_multi = jnp.concatenate(
            [out["cls"]] + [inter[i].mean(axis=(1, 2)) for i in ids[:-1]], -1)
        cls_feat = nn.Dense(self.out_dim, dtype=self.dtype, name="cls_fuse")(
            nn.gelu(nn.Dense(2 * self.out_dim, dtype=self.dtype)(cls_multi)))
        patches = nn.Dense(self.out_dim, dtype=self.dtype,
                           name="patch_proj")(out["feature_map"])
        return cls_feat, patches  # (B, D), (B, h, w, D)


class CrossModalFeatureExtractor(FeatureExtractor):
    """Adds learned modality embeddings (reference feature_extractor.py:120-198)."""

    num_modalities: int = 2

    @nn.compact
    def __call__(self, x, modality_id: int = 0, train: bool = True):
        cls_feat, patches = super().__call__(x, train=train)
        emb = self.param("modality_embed",
                         nn.initializers.truncated_normal(0.02),
                         (self.num_modalities, self.out_dim))
        m = emb[modality_id].astype(cls_feat.dtype)
        return cls_feat + m, patches + m[None, None, None, :]


def compute_prototypes(support_feats, support_labels, n_way: int):
    """Per-class mean prototypes from support features.

    support_feats: (S, ..., D); support_labels: (S,) in [0, n_way).
    Returns (n_way, ..., D) masked means (reference
    prototypical_head.py:54-107)."""
    onehot = jax.nn.one_hot(support_labels, n_way,
                            dtype=support_feats.dtype)       # (S, n_way)
    shape = (support_feats.shape[0], n_way) + (1,) * (support_feats.ndim - 1)
    w = onehot.reshape(shape)
    num = (support_feats[:, None] * w).sum(0)                # (n_way, ..., D)
    den = jnp.maximum(onehot.sum(0).reshape((n_way,) + (1,) * (support_feats.ndim - 1)), 1e-6)
    return num / den


class PrototypicalHead(nn.Module):
    """Cosine-distance classification + keypoint offset/confidence heads."""

    num_keypoints: int
    dim: int = 256
    temperature: float = 10.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, query_feat, prototypes):
        """query_feat: (Q, D); prototypes: (n_way, D).
        Returns dict(logits (Q, n_way), keypoints (Q, K, 2) in [0, 1],
        confidence (Q, K))."""
        q = query_feat / (jnp.linalg.norm(query_feat.astype(jnp.float32),
                                          axis=-1, keepdims=True) + 1e-8)
        p = prototypes / (jnp.linalg.norm(prototypes.astype(jnp.float32),
                                          axis=-1, keepdims=True) + 1e-8)
        logits = self.temperature * (q @ p.T).astype(jnp.float32)
        h = nn.gelu(nn.Dense(self.dim, dtype=self.dtype)(query_feat))
        kpts = nn.Dense(2 * self.num_keypoints, dtype=jnp.float32,
                        name="offset")(h)
        kpts = jax.nn.sigmoid(kpts).reshape(-1, self.num_keypoints, 2)
        conf = nn.Dense(self.num_keypoints, dtype=jnp.float32,
                        name="confidence")(h)
        return {"logits": logits, "keypoints": kpts, "confidence": conf}


class MultiPrototypicalHead(nn.Module):
    """Hierarchical variant: class-level prototypes gate a per-keypoint
    prototype match (reference prototypical_head.py:241-360)."""

    num_keypoints: int
    dim: int = 256
    temperature: float = 10.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, query_feat, class_protos, kpt_protos):
        """query_feat (Q, D); class_protos (n_way, D);
        kpt_protos (n_way, K, D). Returns the PrototypicalHead dict +
        per-keypoint similarity refinement."""
        base = PrototypicalHead(self.num_keypoints, self.dim,
                                self.temperature, dtype=self.dtype,
                                name="base")(query_feat, class_protos)
        q = query_feat / (jnp.linalg.norm(query_feat.astype(jnp.float32),
                                          axis=-1, keepdims=True) + 1e-8)
        kp = kpt_protos / (jnp.linalg.norm(kpt_protos.astype(jnp.float32),
                                           axis=-1, keepdims=True) + 1e-8)
        # (Q, n_way, K): similarity of each query to each class's kpt protos
        sim = jnp.einsum("qd,nkd->qnk", q, kp).astype(jnp.float32)
        cls_w = jax.nn.softmax(base["logits"], -1)            # (Q, n_way)
        kpt_sim = jnp.einsum("qn,qnk->qk", cls_w, sim)        # (Q, K)
        conf = base["confidence"] + self.temperature * kpt_sim
        return dict(base, confidence=conf, kpt_similarity=kpt_sim)


class AttentionFusion(nn.Module):
    """Support/query feature fusion: self-attention over the joint token
    set, cross-attention of queries onto prototypes, gated combine
    (reference attention_fusion.py:7-372)."""

    dim: int = 256
    num_heads: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, query_feats, prototypes):
        """query_feats (Q, D), prototypes (n_way, D) -> (Q, D)."""
        Q = query_feats.shape[0]
        tokens = jnp.concatenate([query_feats, prototypes], 0)[None]
        fused = Attention(self.dim, self.num_heads, dtype=self.dtype,
                          name="self_attn")(tokens)[0, :Q]
        gated = GatedAttention(self.dim, self.num_heads, dtype=self.dtype,
                               name="gate_attn")(
            jnp.concatenate([query_feats, prototypes], 0)[None])[0, :Q]
        w = self.param("mix", nn.initializers.zeros, (2,))
        a = jax.nn.softmax(w)
        return query_feats + a[0] * fused + a[1] * gated


class AdaptiveAttentionFusion(nn.Module):
    """Learned per-sample strategy weighting over fusion paths
    (reference attention_fusion.py:374-537)."""

    dim: int = 256
    num_heads: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, query_feats, prototypes):
        Q = query_feats.shape[0]
        tokens = jnp.concatenate([query_feats, prototypes], 0)[None]
        s1 = Attention(self.dim, self.num_heads, dtype=self.dtype,
                       name="self_attn")(tokens)[0, :Q]
        s2 = GatedAttention(self.dim, self.num_heads, dtype=self.dtype,
                            name="gate_attn")(tokens)[0, :Q]
        s3 = query_feats
        w = nn.Dense(3, dtype=jnp.float32, name="strategy")(query_feats)
        a = jax.nn.softmax(w, -1)[..., None]                  # (Q, 3, 1)
        stack = jnp.stack([s1, s2, s3], 1).astype(jnp.float32)  # (Q, 3, D)
        return (a * stack).sum(1).astype(query_feats.dtype)


class FSKD(nn.Module):
    """Episodic few-shot keypoint detector.

    forward(support_imgs, support_labels, query_imgs): prototypes from
    support CLS features -> adaptive fusion of query features with the
    prototypes -> prototypical classification + keypoint regression
    (reference fskd_small.py:248-296; the minimal CLS->linear variant
    FSKD.py:7-46 corresponds to use_fusion=False)."""

    n_way: int = 5
    num_keypoints: int = 17
    dim: int = 256
    vit_size: str = "small"
    use_fusion: bool = True
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.extractor = FeatureExtractor(self.vit_size, self.dim,
                                          dtype=self.dtype)
        self.fusion = AdaptiveAttentionFusion(self.dim, dtype=self.dtype)
        self.head = PrototypicalHead(self.num_keypoints, self.dim,
                                     dtype=self.dtype)

    def encode(self, imgs, train: bool = True):
        cls_feat, _ = self.extractor(imgs, train=train)
        return cls_feat

    def __call__(self, support_imgs, support_labels, query_imgs,
                 train: bool = True):
        s_feat = self.encode(support_imgs, train)             # (S, D)
        q_feat = self.encode(query_imgs, train)               # (Q, D)
        protos = compute_prototypes(s_feat, support_labels, self.n_way)
        if self.use_fusion:
            q_feat = self.fusion(q_feat, protos)
        return self.head(q_feat, protos)


def fskd_episode_loss(outputs, query_labels, query_kpts, query_vis,
                      kpt_weight: float = 10.0, conf_weight: float = 1.0):
    """Episodic loss: CE class + masked L1 keypoints + BCE confidence
    (the working version of the reference's placeholder adaptation loss,
    fskd_small.py:387)."""
    from tpupose.losses.classify import (
        binary_cross_entropy_with_logits, cross_entropy)

    ce = cross_entropy(outputs["logits"], query_labels).mean()
    m = (query_vis > 0).astype(jnp.float32)
    l1 = (jnp.abs(outputs["keypoints"] - query_kpts).sum(-1) * m).sum() \
        / jnp.maximum(m.sum(), 1.0)
    conf = binary_cross_entropy_with_logits(outputs["confidence"], m).mean()
    return ce + kpt_weight * l1 + conf_weight * conf, {
        "cls": ce, "kpt": l1, "conf": conf}


def maml_adapt(model: FSKD, variables, support_imgs, support_labels,
               support_kpts, support_vis, inner_lr: float = 0.01,
               inner_steps: int = 3):
    """MAML-style inner loop (reference fskd_small.py:331-393 /
    MetaLearningFSKD.maml_forward :397-505): a few SGD steps on the
    support set, functionally (no model cloning — JAX grads over params).

    Returns adapted variables; differentiable, so an outer loss through
    the adapted params yields full second-order MAML under jax.grad.
    """
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def support_loss(p):
        out = model.apply({"params": p, **rest}, support_imgs, support_labels,
                          support_imgs, train=True)
        loss, _ = fskd_episode_loss(out, support_labels, support_kpts,
                                    support_vis)
        return loss

    for _ in range(inner_steps):
        g = jax.grad(support_loss)(params)
        params = jax.tree_util.tree_map(lambda p, gg: p - inner_lr * gg,
                                        params, g)
    return {"params": params, **rest}
