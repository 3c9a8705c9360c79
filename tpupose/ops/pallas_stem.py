"""Pallas-fused ResNet stem (7x7/2 conv + BN + relu + 3x3/2 max-pool)
for the R50 serving path — the round-4 route past the layer1 layout wall.

Why: BASELINE.md's round-3 ceiling analysis showed the R50 e2e serving
program spends 46% of its forward in layer1 at ~20% MFU because XLA
emits the 3-channel stem conv with a batch-in-lanes layout ({0,3,2,1})
that poisons the whole 64-channel stage; the existing Pallas layer1
kernel (ops/pallas_layer1.py) beats XLA 2.7x in isolation but composing
it forced a ~4 ms layout-normalizing copy of the batch-minor stem
output. THIS kernel removes the wall at its source: the stem itself
runs in Pallas, so XLA never owns a 3-channel conv and never emits the
exotic layout — the custom-call results on both sides carry standard
layouts and the layer1 kernel composes copy-free.

Design (every primitive probe-verified on this toolchain's Mosaic,
scripts/r4_probe_mosaic.py + r4_probe2.py, 2026-08-20):

  1. XLA-side prep = ONE 4x4 space-to-depth permutation of the padded
     input: x4[u, v, t*12+s*3+c] = x[4u+t-3, 4v+s-3, c] — measured
     ~0.0-0.1 ms/b128 (it fuses with the normalize; probe F2). A 4x4
     (not 2x2) block size is the point: the stride-2 of the CONV and
     the stride-2 of the POOL both become pure phase arithmetic, and
     every in-kernel access afterwards is stride-1 (Mosaic has no
     strided loads, no lane-splitting reshapes, no lane concats —
     probes A/C/D all fail on this toolchain).
  2. The stem conv output row i = 2u+a splits into four PHASES
     (a, b) in {0,1}^2. Phase (a,b) needs tap ky = 4m+t-2a,
     kx = 4n+s-2b, so its im2col is assembled from (m, n) block shifts
     of x4 — unit-stride slices on 2nd/3rd-minor dims (the proven
     hp-pattern from ops/pallas_layer1.py) stored at lane offsets 64*k
     (the proven store pattern) — then ONE deep matmul per phase
     (256/384/576-deep contractions: the MXU runs full, vs ~20% MFU on
     XLA's 3-channel stem).
  3. The 3x3/2 max-pool is FREE in phase space: pool row 2i'+d for
     d in {-1,0,1} is exactly {y_1[i'-1], y_0[i'], y_1[i']}, i.e. three
     shifted element-wise maxes across phase buffers, then the same
     along columns. No strided selection ever materializes. (Zero
     padding is exact here because the pooled values are post-relu
     >= 0.)
  4. Output is written as (B, 64, 48, 128) with lanes 64..127 zeroed so
     the downstream layer1 Pallas kernel's operand is already
     lane-aligned — no producer-side pad op, no relayout at either
     custom-call boundary.

BN (and optionally the uint8 normalize) is pre-folded into the phase
weight matrices, int8_engine-style.

Reference counterpart: none (the torch stack runs a stock torchvision
stem; this is TPU-specific speed-of-light work on the graded config,
BASELINE.json:2). The stem math itself mirrors
/root/reference/HPE/thirdparty torchvision semantics: conv7x7/2 pad 3,
BN, relu, maxpool3x3/2 pad 1.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# phase (a, b) -> the (m, n) block shifts whose taps carry any valid
# kernel index: ky = 4m + t - 2a must land in [0, 6] for some t in 0..3
_M_BLOCKS = {0: (0, 1), 1: (0, 1, 2)}
_PHASES = ((0, 0), (0, 1), (1, 0), (1, 1))


def stem_s2d(x):
    """XLA-side 4x4 space-to-depth: (B, 256, 192, 3) -> (B, 66, 50, 64)
    with x4[u, v, t*12+s*3+c] = x_padded[4u+t, 4v+s, c] (rows padded
    (3,5), cols (3,5); lanes 48 -> 64 zero pad). Pure permutation — no
    duplication; measured ~free at b128 (fuses with the normalize)."""
    B, H, W, C = x.shape
    if (H, W, C) != (256, 192, 3):
        raise ValueError(f"stem_s2d expects (B,256,192,3), got {x.shape}")
    xp = jnp.pad(x, ((0, 0), (3, 5), (3, 5), (0, 0)))
    x4 = xp.reshape(B, 66, 4, 50, 4, 3)
    x4 = jnp.transpose(x4, (0, 1, 3, 2, 4, 5)).reshape(B, 66, 50, 48)
    return jnp.pad(x4, ((0, 0), (0, 0), (0, 0), (0, 16)))


def _fold_bn(kernel, scale, bias, mean, var, eps=1e-5):
    # pure NumPy on host values: the fold runs at interceptor-build time,
    # possibly inside a jit trace, where jnp ops would produce tracers
    k = np.asarray(kernel, np.float64)
    f = np.asarray(scale, np.float64) / np.sqrt(
        np.asarray(var, np.float64) + eps)
    return k * f, np.asarray(bias, np.float64) - np.asarray(mean,
                                                           np.float64) * f


def center_raw(images, mean=(0.485, 0.456, 0.406)):
    """Per-channel centering of raw uint8 pixels: x - 255*mean_c. Paired
    with fold_stem_weights(input_scale=1/(255*std)), this reproduces the
    ImageNet normalize EXACTLY including at the conv's zero-padded
    border (centered raw 0 == normalized 0, so the kernel's zero pad is
    the normalized pipeline's zero pad; a bias-side shift fold would get
    the border wrong). Cheap: fuses into the s2d transpose."""
    m = jnp.asarray(mean, jnp.float32) * 255.0
    return images.astype(jnp.float32) - m


def fold_stem_weights(variables, dtype=jnp.bfloat16,
                      input_scale=None) -> Dict[str, jnp.ndarray]:
    """Fold the stem Conv_0 + BatchNorm_0 into four phase matmul
    weights w_ab of shape (64 * n_blocks(a) * n_blocks(b), 64), rows
    indexed [(m, n) block, t*12+s*3+c], plus a shared (1, 64) f32 bias.

    If input_scale (per-channel, len 3) is given, the input scaling
    x*scale_c (e.g. 1/(255*std_c) for the uint8 normalize, with the
    mean handled by center_raw) is folded in as well, so the kernel can
    consume centered raw pixel values. Only the SCALE may be folded:
    it commutes with the conv's zero padding, a shift would not."""
    p = variables["params"]["ResNet_0"]
    st = variables["batch_stats"]["ResNet_0"]
    k = p["Conv_0"]["kernel"]                    # (7, 7, 3, 64)
    bnp, bns = p["BatchNorm_0"], st["BatchNorm_0"]
    wf, bias = _fold_bn(k, bnp["scale"], bnp["bias"],
                        bns["mean"], bns["var"])  # (7,7,3,64), (64,)
    if input_scale is not None:
        sc = np.asarray(input_scale, np.float64).reshape(1, 1, 3, 1)
        wf = wf * sc

    # ONE (576, 256) matrix: rows = 9 (m, n) blocks x (t*12+s*3+c),
    # cols = 4 phase output blocks [64*(2a+b) + o]. Taps a phase does
    # not use are zero rows in its column block — the kernel then runs
    # a single full-width matmul per row chunk (N=256 = 2x the MXU,
    # vs N=64 quarter-width per-phase matmuls, measured 3.2 ms).
    wall = np.zeros((576, 256), np.float64)
    for a, b in _PHASES:
        ph = 2 * a + b
        for bi, (m, n) in enumerate((m, n) for m in range(3)
                                    for n in range(3)):
            for t in range(4):
                for s in range(4):
                    ky, kx = 4 * m + t - 2 * a, 4 * n + s - 2 * b
                    if 0 <= ky <= 6 and 0 <= kx <= 6:
                        r = bi * 64 + t * 12 + s * 3
                        wall[r:r + 3, 64 * ph:64 * (ph + 1)] = wf[ky, kx]
    out: Dict[str, jnp.ndarray] = {"w_all": jnp.asarray(wall, dtype)}
    out["bias"] = jnp.asarray(np.tile(bias, 4).reshape(1, 256),
                              jnp.float32)
    return out


def _stem_kernel(x_ref, w_ref, b_ref, out_ref, im_ref, y_ref, v_ref, *,
                 S, dtype, out_channels, chunks):
    """All four phase convs in ONE matmul per row chunk (N=256 output
    lanes = all phases side by side), then the pool as shifted lane-
    slice maxes of the phase buffer. Row chunking bounds the Mosaic
    VMEM stack (the unchunked wide-matmul form OOMed at 42/16 MB); the
    S images of the block are processed sequentially with one-image
    scratch (batching them into the matmul M-dim crashes the round-4
    Mosaic, same as the layer1 kernel)."""
    w = w_ref[...]
    bias = b_ref[...]
    rows = 64 // chunks
    blocks9 = [(m, n) for m in range(3) for n in range(3)]

    def ushift(v):       # v[u-1] with zero top row (exact: values >= 0)
        return jnp.pad(v, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :64]

    for s in range(S):
        x = x_ref[s:s + 1]
        for ci in range(chunks):
            c0 = ci * rows
            for k, (m, n) in enumerate(blocks9):
                im_ref[:, 64 * k:64 * (k + 1)] = (
                    x[:, m + c0:m + c0 + rows, n:n + 48, :]
                    .reshape(rows * 48, 64))
            acc = jnp.dot(im_ref[...], w,
                          preferred_element_type=jnp.float32)
            y_ref[:, c0:c0 + rows] = (
                jax.nn.relu(acc + bias).astype(dtype)
                .reshape(1, rows, 48, 256))

        # pool rows 2i'+d, d in {-1,0,1} -> {y1[i'-1], y0[i'], y1[i']}
        y00 = y_ref[:, :, :, 0:64]
        y01 = y_ref[:, :, :, 64:128]
        y10 = y_ref[:, :, :, 128:192]
        y11 = y_ref[:, :, :, 192:256]
        rm0 = jnp.maximum(jnp.maximum(y00, y10), ushift(y10))
        rm1 = jnp.maximum(jnp.maximum(y01, y11), ushift(y11))
        # the column shift rm1[v-1] routes through a scratch ref: the
        # direct sublane-dim jnp.pad MISCOMPILES (remote-compile HTTP
        # 500) whenever the value chain includes the chunked matmul
        # above, though it works standalone — scripts/r4 bisects
        v_ref[:, :, 0:1] = jnp.zeros((1, 64, 1, 64), dtype)
        v_ref[:, :, 1:49] = rm1
        pooled = jnp.maximum(jnp.maximum(rm0, rm1), v_ref[:, :, 0:48])
        out_ref[s:s + 1, :, :, 0:64] = pooled
        if out_channels > 64:
            out_ref[s:s + 1, :, :, 64:out_channels] = jnp.zeros(
                (1, 64, 48, out_channels - 64), dtype)


def stem_pool_pallas(x4, weights: Dict[str, jnp.ndarray],
                     interpret: bool | None = None, group: int = 1,
                     chunks: int = 2, out_channels: int = 128):
    """x4 (B, 66, 50, 64) (from stem_s2d) -> pooled stem features
    (B, 64, 48, out_channels), channels beyond 64 zero-filled so the
    layer1 Pallas kernel's operand is born lane-aligned. `chunks` splits
    the conv over output-row chunks to bound kernel VMEM."""
    B = x4.shape[0]
    dtype = x4.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    S = group
    while B % S:
        S //= 2
    S = max(S, 1)
    args = [weights["w_all"], weights["bias"]]
    kernel = partial(_stem_kernel, S=S, dtype=dtype,
                     out_channels=out_channels, chunks=chunks)
    return pl.pallas_call(
        kernel,
        grid=(B // S,),
        in_specs=[pl.BlockSpec((S, 66, 50, 64), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                        memory_space=pltpu.VMEM) for a in args],
        out_specs=pl.BlockSpec((S, 64, 48, out_channels),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 64, 48, out_channels), dtype),
        scratch_shapes=[
            pltpu.VMEM(((64 // chunks) * 48, 576), dtype),
            pltpu.VMEM((1, 64, 48, 256), dtype),
            pltpu.VMEM((1, 64, 49, 64), dtype),
        ],
        interpret=interpret,
    )(x4, *args)


def stem_reference(variables, x, dtype=jnp.bfloat16):
    """jnp oracle: the flax stem (conv7x7/2 + folded BN + relu +
    maxpool3x3/2) on normalized input x (B, 256, 192, 3)."""
    p = variables["params"]["ResNet_0"]
    st = variables["batch_stats"]["ResNet_0"]
    wf, bias = _fold_bn(p["Conv_0"]["kernel"],
                        p["BatchNorm_0"]["scale"], p["BatchNorm_0"]["bias"],
                        st["BatchNorm_0"]["mean"], st["BatchNorm_0"]["var"])
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), wf, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    y = jax.nn.relu(y).astype(dtype).astype(jnp.float32)
    y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                constant_values=-jnp.inf)
    y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), "valid")
    return y.astype(dtype)


def fused_stem_apply(x, weights, group: int = 1, chunks: int = 4,
                     interpret: bool | None = None,
                     out_channels: int = 128):
    """normalized (B,256,192,3) -> pooled (B,64,48,out_channels)."""
    return stem_pool_pallas(stem_s2d(x), weights, interpret=interpret,
                            group=group, chunks=chunks,
                            out_channels=out_channels)


def make_stem_interceptor(variables, dtype=jnp.bfloat16, group: int = 1,
                          chunks: int = 4, out_channels: int = 128):
    """Flax interceptor swapping the backbone stem for the fused kernel:
      - ResNet_0/Conv_0        -> stem_s2d + fused conv+pool kernel
      - ResNet_0/BatchNorm_0   -> identity (folded into the kernel)
      - StemPool               -> identity (pool fused into the kernel)
    The inline nn.relu between them is a no-op on the kernel's output
    (post-relu >= 0). Set out_channels=64 when NOT composing with the
    layer1 Pallas kernel (the flax Bottleneck convs expect 64)."""
    w = fold_stem_weights(variables, dtype=dtype)

    def _stem_path(mod):
        try:
            path = mod.path
        except Exception:  # unbound module — not ours
            return None
        return path

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if context.method_name != "__call__":
            return next_fun(*args, **kwargs)
        name = type(mod).__name__
        if name == "Conv":
            path = _stem_path(mod)
            if (path and len(path) >= 2 and path[-1] == "Conv_0"
                    and path[-2].startswith("ResNet")):
                return fused_stem_apply(args[0].astype(dtype), w,
                                        group=group, chunks=chunks,
                                        out_channels=out_channels)
        elif name == "BatchNorm":
            path = _stem_path(mod)
            if (path and len(path) >= 2 and path[-1] == "BatchNorm_0"
                    and path[-2].startswith("ResNet")):
                return args[0]
        elif name == "StemPool":
            return args[0]
        return next_fun(*args, **kwargs)

    return interceptor


def fast_r50_stem_apply(apply_fn, variables, scales, x, group: int = 1,
                        chunks: int = 4, l1_group: int = 1,
                        bridge: bool = True, **kwargs):
    """The round-4 composed fast serving forward: fused Pallas stem+pool
    (this module) + Pallas layer1 (ops/pallas_layer1.py) + Pallas
    block2_0 bridge (ops/pallas_bridge.py, contiguous coverage of every
    64x48 tensor — see BASELINE.md round-4 for why) + int8 PTQ tail
    (ops/quant.py). `scales` from ops.quant.calibrate; pass scales=None
    for the all-bf16 variant."""
    from contextlib import ExitStack

    import flax.linen as nn

    from tpupose.ops.pallas_layer1 import make_layer1_interceptor

    ints = [make_stem_interceptor(variables, group=group, chunks=chunks),
            make_layer1_interceptor(variables, group=l1_group)]
    if bridge:
        from tpupose.ops.pallas_bridge import make_bridge_interceptor

        ints.append(make_bridge_interceptor(variables))
    if scales is not None:
        from tpupose.ops.quant import make_quant_interceptor

        ints.append(make_quant_interceptor(variables, scales))
    with ExitStack() as st:
        for i in ints:
            st.enter_context(nn.intercept_methods(i))
        return apply_fn(variables, x, **kwargs)
