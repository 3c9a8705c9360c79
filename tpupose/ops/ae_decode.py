"""Associative-embedding grouping decode, fully on device.

Bottom-up inference: find per-joint heatmap peaks, then assemble people by
matching peak tag values (Newell et al., NeurIPS 2017). The classic
implementations run Munkres on the host per image; here the whole decode is
one jittable static-shape program so it fuses with the forward pass:

- peak detection: 3x3 max-pool equality + top-P per joint (P = max_people);
- grouping: a lax.scan over the K joint types in anatomical order. Per
  joint, a P-step fori_loop walks candidates in descending score order
  (top_k already sorts) and either joins the nearest existing group by
  |tag - group_mean| (greedy, one group per joint enforced by a taken
  mask) or claims an empty group slot. All state is dense (B, P) tensors —
  no per-person host lists.

Greedy-by-score matching is the standard practical simplification of the
Munkres assignment (used by several public AE implementations); the
equivalence on separated tags is exercised in tests/test_bottom_up.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_BIG = 1e9


def find_peaks(heatmaps, max_people: int):
    """Per-joint local maxima. heatmaps: (B, K, H, W) fp32.

    Returns (coords (B, K, P, 2) xy in heatmap px, scores (B, K, P),
    flat_idx (B, K, P)) sorted by descending score.
    """
    B, K, H, W = heatmaps.shape
    pooled = lax.reduce_window(
        heatmaps, -jnp.inf, lax.max, (1, 1, 3, 3), (1, 1, 1, 1), "SAME")
    mask = heatmaps >= pooled
    # tie-break exact plateaus: two equal-valued pixels in one 3x3 window
    # both satisfy >= pooled and would each seed a (duplicate) person in
    # the grouping below. Keep only the highest linear index among the
    # masked pixels of each window — one survivor per within-window tie.
    # (Int8-served heatmaps are lattice-quantized, so exact neighbor ties
    # are common there, not just a fp32 corner case.)
    lin = jnp.arange(H * W, dtype=jnp.int32).reshape(1, 1, H, W)
    idxm = jnp.where(mask, lin, -1)
    pooled_idx = lax.reduce_window(
        idxm, jnp.int32(-1), lax.max, (1, 1, 3, 3), (1, 1, 1, 1), "SAME")
    peaks = jnp.where(mask & (idxm == pooled_idx), heatmaps, 0.0)
    flat = peaks.reshape(B, K, H * W)
    scores, idx = lax.top_k(flat, max_people)                # (B, K, P)
    xs = (idx % W).astype(jnp.float32)
    ys = (idx // W).astype(jnp.float32)
    return jnp.stack([xs, ys], axis=-1), scores, idx


def decode_ae(heatmaps, tags, max_people: int = 8,
              score_threshold: float = 0.1, tag_threshold: float = 1.0,
              refine: bool = True):
    """Group per-joint peaks into people by tag distance.

    heatmaps, tags: (B, K, H, W) fp32 (same NKHW convention as
    ops/decode.decode_heatmaps). Returns a dict:
      coords (B, P, K, 2) heatmap px, scores (B, P, K) (0 = joint absent),
      person_scores (B, P), person_mask (B, P) — P = max_people, person
      slots in creation order.
    """
    B, K, H, W = heatmaps.shape
    P = max_people
    coords, scores, idx = find_peaks(heatmaps, P)
    tflat = tags.reshape(B, K, H * W)
    tagv = jnp.take_along_axis(tflat, idx, axis=2)           # (B, K, P)
    if refine:
        # classic quarter-offset toward the higher neighbor — the shared
        # top-down rule, generalized over the candidate axis
        from tpupose.ops.decode import quarter_offset_refine

        coords = quarter_offset_refine(heatmaps, coords)

    def joint_step(state, inp):
        g_tag_sum, g_cnt = state
        c_xy, c_score, c_tag = inp                           # (B,P,2) (B,P) (B,P)
        g_mean = g_tag_sum / jnp.maximum(g_cnt, 1.0)
        active = g_cnt > 0
        # pairwise candidate->group cost, frozen at the joint's entry state
        # (groups created during this joint are 'taken', so the stale mean
        # for them is never consulted)
        cost = jnp.abs(c_tag[:, :, None] - g_mean[:, None, :])  # (B, P, P)
        cost = jnp.where(active[:, None, :], cost, _BIG)

        def cand_body(p, st):
            g_tag_sum, g_cnt, jc, js, taken = st
            c = cost[:, p, :] + _BIG * taken                 # (B, P)
            best = jnp.argmin(c, axis=-1)                    # (B,)
            cbest = jnp.min(c, axis=-1)
            valid = c_score[:, p] > score_threshold
            match = valid & (cbest < tag_threshold)
            empty = (g_cnt <= 0) & ~taken                    # (B, P)
            slot_new = jnp.argmax(empty, axis=-1)
            can_new = valid & ~match & jnp.any(empty, axis=-1)
            slot = jnp.where(match, best, slot_new)
            assign = match | can_new
            onehot = jax.nn.one_hot(slot, P) * assign[:, None]
            g_tag_sum = g_tag_sum + onehot * c_tag[:, p][:, None]
            g_cnt = g_cnt + onehot
            jc = jnp.where(onehot[..., None] > 0,
                           c_xy[:, p][:, None, :], jc)
            js = jnp.where(onehot > 0, c_score[:, p][:, None], js)
            taken = taken | (onehot > 0)
            return g_tag_sum, g_cnt, jc, js, taken

        jc0 = jnp.zeros((B, P, 2), jnp.float32)
        js0 = jnp.zeros((B, P), jnp.float32)
        taken0 = jnp.zeros((B, P), bool)
        g_tag_sum, g_cnt, jc, js, _ = lax.fori_loop(
            0, P, cand_body, (g_tag_sum, g_cnt, jc0, js0, taken0))
        return (g_tag_sum, g_cnt), (jc, js)

    init = (jnp.zeros((B, P), jnp.float32), jnp.zeros((B, P), jnp.float32))
    (g_tag_sum, g_cnt), (jcs, jss) = lax.scan(
        joint_step, init,
        (jnp.swapaxes(coords, 0, 1), jnp.swapaxes(scores, 0, 1),
         jnp.swapaxes(tagv, 0, 1)))
    out_coords = jnp.transpose(jcs, (1, 2, 0, 3))            # (B, P, K, 2)
    out_scores = jnp.transpose(jss, (1, 2, 0))               # (B, P, K)
    found = jnp.sum((out_scores > 0).astype(jnp.float32), axis=-1)
    person_scores = jnp.sum(out_scores, axis=-1) / jnp.maximum(found, 1.0)
    return {"coords": out_coords, "scores": out_scores,
            "person_scores": person_scores, "person_mask": g_cnt > 0}
