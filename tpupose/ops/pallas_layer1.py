"""Pallas-fused ResNet layer1 for the R50 serving path.

Why (measured, v5e, scripts: engine_segments / stage_compare, round 3):
layer1 — three 64-channel bottlenecks at 64x48 — costs ~4.1 ms of the
~9 ms R50-256x192 b128 forward in BOTH bf16 and int8 under XLA (~20%
MFU): 64-channel NHWC tensors use half of the 128 lanes of every load
and the nine stride-1 convs bounce 64x48 activations through HBM. The
whole layer fits VMEM per image (input 393 KB bf16, widest intermediate
3.4 MB), so one Pallas kernel runs all three bottlenecks per grid step
with zero HBM traffic between the nine convs:

  - 1x1 convs are plain (HW, Cin) @ (Cin, Cout) matmuls on the MXU;
  - the 3x3 convs build a VMEM im2col (HW, 576) and do ONE matmul with
    a full 576-deep contraction (vs 64) — the MXU runs at 50%+ instead
    of ~20%;
  - BatchNorm is pre-folded into weights/biases (ops/int8_engine
    recipe), relu and residual adds stay in registers.

The kernel is inference-only (serving path; training keeps the flax
graph and XLA autodiff). `make_layer1_interceptor` swaps it into any
`model.apply` via flax method interception — composable with the int8
PTQ interceptor (ops/quant.py).

MEASURED OUTCOME (v5e b128, round 3): the kernel in isolation runs
layer1 in **1.54 ms vs XLA's 4.1 ms** (2.7x). Embedded in the full
model, however, the win is erased by a LAYOUT WALL: XLA emits the
3-channel stem conv with a batch-in-lanes layout ({0,3,2,1}) and
normalizing it for the custom-call operand inserts a 100-400 MB layout
copy (estimated at 4.1 ms in the compiled HLO) — full-model e2e
measured 13.9-14.0 ms vs 11.2 bf16. Attempted escapes, all measured
worse: maxpool via strided slices to keep the exotic layout alive
(28 ms — TPU strided slices are pathological), stem as explicit
49-slice im2col + GEMM (69 ms, same reason), channel-padding the
operand to 128 lanes (the copy persists upstream), space-to-depth
repacking (analytically MAC-neutral: the zero-fill exactly cancels the
lane gain). The kernel stays in-tree (tested, exact vs the flax
blocks) as the fast path for callers whose producer already emits
standard layouts; the production serving path remains the int8
intercept/engine (ops/quant.py, ops/int8_engine.py). Full analysis:
BASELINE.md round-3 notes.

Reference counterpart: none (the torch stack runs stock torchvision
convs; this is TPU-specific speed-of-light work on the graded config,
BASELINE.json:2).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fold_bn(kernel, scale, bias, mean, var, eps=1e-5):
    f = scale.astype(jnp.float32) / jnp.sqrt(var.astype(jnp.float32) + eps)
    return (kernel.astype(jnp.float32) * f,
            bias.astype(jnp.float32) - mean.astype(jnp.float32) * f)


def fold_layer1_weights(variables, n_blocks: int = 3,
                        dtype=jnp.bfloat16) -> Dict[str, jnp.ndarray]:
    """Fold layer1's conv+BN pairs (blocks Bottleneck_0..n-1 of the
    backbone under variables['params']['ResNet_0']) into matmul-ready
    weights: 1x1 kernels as (Cin, Cout), 3x3 kernels as (9*Cin, Cout)
    im2col layout [dy, dx, cin], biases as (1, Cout) fp32."""
    p = variables["params"]["ResNet_0"]
    s = variables["batch_stats"]["ResNet_0"]
    out: Dict[str, jnp.ndarray] = {}

    def fold(block, ci):
        k = p[block][f"Conv_{ci}"]["kernel"]
        bn_p = p[block][f"BatchNorm_{ci}"]
        bn_s = s[block][f"BatchNorm_{ci}"]
        return _fold_bn(k, bn_p["scale"], bn_p["bias"],
                        bn_s["mean"], bn_s["var"])

    def pad_in(k):
        """Zero-pad a (Cin, O) matmul weight's input dim up to 128.

        The kernel's INPUT tensor is channel-padded to 128 lanes before
        the pallas_call: a sub-128 lane dim forces XLA to hand the
        custom-call operand in an UNTILED layout, and the producer-side
        relayout of (B, 64, 48, 64) was measured at ~5.6 ms — 3.6x the
        kernel itself. Padding the weight rows instead costs only zero
        MACs on an already half-empty MXU contraction."""
        if k.shape[0] < 128:
            k = jnp.pad(k, ((0, 128 - k.shape[0]), (0, 0)))
        return k

    for i in range(n_blocks):
        blk = f"Bottleneck_{i}"
        for ci, tag in enumerate(("w1", "w2", "w3")):
            k, b = fold(blk, ci)
            if tag == "w2":                       # (3, 3, C, O) -> (9C, O)
                k = k.reshape(-1, k.shape[-1])
            else:                                 # (1, 1, C, O) -> (C, O)
                k = k.reshape(k.shape[-2], k.shape[-1])
            if i == 0 and tag == "w1":
                k = pad_in(k)
            out[f"b{i}_{tag}"] = k.astype(dtype)
            out[f"b{i}_{tag}b"] = b.reshape(1, -1)
        if f"Conv_{3}" in p[blk]:                 # block 0 downsample
            k, b = fold(blk, 3)
            out[f"b{i}_wds"] = pad_in(
                k.reshape(k.shape[-2], k.shape[-1])).astype(dtype)
            out[f"b{i}_wdsb"] = b.reshape(1, -1)
    return out


_ARG_ORDER = ("b0_wds", "b0_wdsb",
              "b0_w1", "b0_w1b", "b0_w2", "b0_w2b", "b0_w3", "b0_w3b",
              "b1_w1", "b1_w1b", "b1_w2", "b1_w2b", "b1_w3", "b1_w3b",
              "b2_w1", "b2_w1b", "b2_w2", "b2_w2b", "b2_w3", "b2_w3b")


def _conv1x1(h, w, b):
    """h (HW, Cin) @ w (Cin, Cout) + b -> f32 (HW, Cout)."""
    y = jnp.dot(h, w, preferred_element_type=jnp.float32)
    return y + b


def _conv3x3(h3, w2, b2, im_ref, dtype):
    """3x3 SAME conv on h3 (G, H, W, C) via a VMEM im2col scratch.

    Two shapes, selected by the scratch width: 9C -> nine shifted
    sub-slice STORES then ONE 576-deep matmul (fastest when VMEM
    allows); 3C -> per-dy assembly with three matmuls accumulated in
    f32 (smaller stack, lets bigger per-step image groups compile).
    (A jnp.concatenate of the lane-offset slices is not implemented by
    Mosaic — 'result/input offset mismatch on non-concat dimension' —
    so the buffer is always assembled through the scratch ref.)"""
    G, H, W, C = h3.shape
    hp = jnp.pad(h3, ((0, 0), (1, 1), (1, 1), (0, 0)))
    if im_ref.shape[-1] >= 9 * C:
        for k, (dy, dx) in enumerate((dy, dx) for dy in range(3)
                                     for dx in range(3)):
            im_ref[:, k * C:(k + 1) * C] = (
                hp[:, dy:dy + H, dx:dx + W, :].reshape(G * H * W, C)
                .astype(dtype))
        y = jnp.dot(im_ref[...], w2, preferred_element_type=jnp.float32)
        return y + b2
    acc = None
    for dy in range(3):
        for dx in range(3):
            im_ref[:, dx * C:(dx + 1) * C] = (
                hp[:, dy:dy + H, dx:dx + W, :].reshape(G * H * W, C)
                .astype(dtype))
        part = jnp.dot(im_ref[:, :3 * C], w2[dy * 3 * C:(dy + 1) * 3 * C],
                       preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc + b2


def _block(x2d, G, H, W, w1, b1, w2, b2, w3, b3, identity, im_ref, dtype):
    """One bottleneck on a (G*HW, C) tile; identity (G*HW, 256) bf16
    (kept in the storage dtype to halve the kernel's VMEM footprint —
    the flax model's residual is bf16 too)."""
    h = jax.nn.relu(_conv1x1(x2d, w1, b1)).astype(dtype)
    h = jax.nn.relu(_conv3x3(h.reshape(G, H, W, -1), w2, b2, im_ref,
                             dtype)).astype(dtype)
    h = _conv1x1(h, w3, b3)
    return jax.nn.relu(h + identity.astype(jnp.float32)).astype(dtype)


def _layer1_kernel(x_ref, *refs, S, H, W, dtype):
    """S images per grid step, processed SEQUENTIALLY with one-image
    VMEM (the round-3 form batched images into the matmul M-dim instead,
    which the round-4 toolchain's Mosaic no longer compiles — a silent
    compile-helper crash at group>=2 — and one-image shapes keep the
    stack small while the seq loop still amortizes per-step overhead)."""
    im_ref = refs[-1]                                     # VMEM scratch
    out_ref = refs[-2]
    (wds, bds, w1_0, b1_0, w2_0, b2_0, w3_0, b3_0,
     w1_1, b1_1, w2_1, b2_1, w3_1, b3_1,
     w1_2, b1_2, w2_2, b2_2, w3_2, b3_2) = [r[...] for r in refs[:-2]]
    for s in range(S):
        x = x_ref[s:s + 1].reshape(H * W, -1)             # (HW, 64)
        idn = _conv1x1(x, wds, bds).astype(dtype)         # (HW, 256)
        y = _block(x, 1, H, W, w1_0, b1_0, w2_0, b2_0, w3_0, b3_0, idn,
                   im_ref, dtype)
        y = _block(y, 1, H, W, w1_1, b1_1, w2_1, b2_1, w3_1, b3_1, y,
                   im_ref, dtype)
        y = _block(y, 1, H, W, w1_2, b1_2, w2_2, b2_2, w3_2, b3_2, y,
                   im_ref, dtype)
        out_ref[s:s + 1] = y.reshape(1, H, W, -1)


def layer1_pallas(x, weights: Dict[str, jnp.ndarray],
                  interpret: bool | None = None, group: int = 2,
                  narrow_im: bool = False):
    """x (B, H, W, 64) bf16 -> (B, H, W, 256) bf16. `group` images per
    grid step, processed sequentially with one-image VMEM (bigger in/out
    DMAs, amortized step overhead). interpret=None auto-selects the
    Pallas interpreter off-TPU (CPU tests)."""
    B, H, W, C = x.shape
    dtype = x.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if C < 128:
        # lane-align the operand (see fold_layer1_weights.pad_in): the
        # producer-side pad fuses into the previous op; a sub-128 lane
        # dim would instead force an untiled-layout relayout (~5.6 ms)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 128 - C)))
        C = 128
    S = group
    while B % S:
        S //= 2
    S = max(S, 1)
    args = [weights[k] for k in _ARG_ORDER]
    kernel = partial(_layer1_kernel, S=S, H=H, W=W, dtype=dtype)
    return pl.pallas_call(
        kernel,
        grid=(B // S,),
        in_specs=[pl.BlockSpec((S, H, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                        memory_space=pltpu.VMEM) for a in args],
        out_specs=pl.BlockSpec((S, H, W, 256), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, 256), dtype),
        # im2col width: 9C (one deep matmul) or 3C (narrow_im: per-dy
        # accumulation, smaller VMEM stack) — see _conv3x3
        scratch_shapes=[pltpu.VMEM(
            (H * W, weights["b0_w2"].shape[0] // (3 if narrow_im else 1)),
            dtype)],
        interpret=interpret,
    )(x, *args)


def layer1_reference(x, weights):
    """jnp oracle with the same folded weights (unit-test pin + the
    calibration-pass stand-in)."""
    B, H, W, _ = x.shape
    x2 = x.reshape(B, H * W, -1).astype(jnp.float32)
    w = {k: v.astype(jnp.float32) for k, v in weights.items()}
    cin = w["b0_w1"].shape[0]        # lane-padded weights (pad_in)
    if x2.shape[-1] < cin:
        x2 = jnp.pad(x2, ((0, 0), (0, 0), (0, cin - x2.shape[-1])))

    def c1(h, wk, bk):
        return jnp.einsum("bpc,co->bpo", h, w[wk]) + w[bk]

    def c3(h, wk, bk):
        hp = jnp.pad(h.reshape(B, H, W, -1), ((0, 0), (1, 1), (1, 1),
                                              (0, 0)))
        cols = [hp[:, dy:dy + H, dx:dx + W, :]
                for dy in range(3) for dx in range(3)]
        im = jnp.concatenate(cols, axis=-1).reshape(B, H * W, -1)
        return jnp.einsum("bpc,co->bpo", im, w[wk]) + w[bk]

    idn = c1(x2, "b0_wds", "b0_wdsb")
    h = x2
    for i in range(3):
        y = jax.nn.relu(c1(h, f"b{i}_w1", f"b{i}_w1b"))
        y = jax.nn.relu(c3(y, f"b{i}_w2", f"b{i}_w2b"))
        y = c1(y, f"b{i}_w3", f"b{i}_w3b")
        h = jax.nn.relu(y + idn)
        idn = h
    return h.reshape(B, H, W, -1)


def make_layer1_interceptor(variables, n_blocks: int = 3,
                            dtype=jnp.bfloat16, group: int = 2):
    """Flax interceptor replacing the backbone's first-stage Bottleneck
    calls with the fused Pallas kernel: Bottleneck_0 computes the whole
    layer, Bottleneck_1..n-1 pass through. Compose with the int8 PTQ
    interceptor (ops/quant.py) for the full fast serving path."""
    w = fold_layer1_weights(variables, n_blocks=n_blocks, dtype=dtype)
    passthrough = {f"Bottleneck_{i}" for i in range(1, n_blocks)}

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (context.method_name == "__call__"
                and type(mod).__name__ == "Bottleneck"):
            name = mod.name or ""
            if name == "Bottleneck_0":
                return layer1_pallas(args[0].astype(dtype), w, group=group)
            if name in passthrough:
                return args[0]
        return next_fun(*args, **kwargs)

    return interceptor


def fast_r50_apply(apply_fn, variables, scales, x, **kwargs):
    """The composed fast serving forward: Pallas layer1 + int8 PTQ tail
    (every other calibrated conv). `scales` from ops.quant.calibrate;
    layer1-internal conv scales are simply unused."""
    import flax.linen as nn

    from tpupose.ops.quant import make_quant_interceptor

    l1 = make_layer1_interceptor(variables)
    q = make_quant_interceptor(variables, scales)
    with nn.intercept_methods(l1), nn.intercept_methods(q):
        return apply_fn(variables, x, **kwargs)
