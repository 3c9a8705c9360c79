"""Pallas "bridge" kernel: ResNet block2_0 (Bottleneck_3) for the R50
serving path — the third and final kernel of the contiguous-coverage
chain (stem+pool -> layer1 -> THIS), after which XLA's first tensor is
(B, 32, 24, 512), where it shows no exotic-layout preference.

Why (round-4 measurement, BASELINE.md): XLA prefers exotic layouts
({0,3,2,1} / {3,0,2,1}) for every conv touching a 64x48 tensor and
charges relayout copies (~1 GB/batch measured in the composed HLO) at
every custom-call boundary adjacent to them. The stem and layer1 Pallas
kernels therefore LOSE end-to-end despite winning in isolation, unless
every 64x48 consumer is also a custom call. block2_0 is the last one:
its 1x1 reduce eats the 64x48x256 layer1 output, its 3x3 stride-2 conv
drops to 32x24, and its 1x1 expand + downsample-add emit 32x24x512.

Stride-2 inside the kernel uses the same phase trick as the stem kernel
(ops/pallas_stem.py): output-grid phases make row selection a FREE
leading-dim split; the column (sublane) stride-2 — which Mosaic cannot
express as a strided read — becomes a tiny SELECTION MATMUL on the MXU
(out[u, v'] = S @ rows[u], S the 0/1 even-column selector; measured
~19-60 MMAC/img, noise next to the block's ~450 MMAC/img of real work).

Reference counterpart: none (torchvision Bottleneck semantics; TPU-
specific speed-of-light work on the graded config, BASELINE.json:2).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fold_bn_np(kernel, bn_p, bn_s, eps=1e-5):
    k = np.asarray(kernel, np.float64)
    f = np.asarray(bn_p["scale"], np.float64) / np.sqrt(
        np.asarray(bn_s["var"], np.float64) + eps)
    b = (np.asarray(bn_p["bias"], np.float64)
         - np.asarray(bn_s["mean"], np.float64) * f)
    return k * f, b


def fold_bridge_weights(variables, dtype=jnp.bfloat16
                        ) -> Dict[str, jnp.ndarray]:
    """Fold Bottleneck_3 (block2_0: 1x1 256->128, 3x3/2 128->128,
    1x1 128->512, downsample 1x1/2 256->512) + BNs into matmul weights.

    The 3x3/2 conv becomes W2 (2048, 128): rows indexed
    [(m, n) in {-1,0}^2 shift block][(p, q) phase * 128 + c], with
    W2[...] = w2[ky=2m+p+1, kx=2n+q+1, c, :] where valid, zero rows
    elsewhere (7/16 of the density is padding)."""
    p = variables["params"]["ResNet_0"]["Bottleneck_3"]
    s = variables["batch_stats"]["ResNet_0"]["Bottleneck_3"]
    out: Dict[str, jnp.ndarray] = {}

    k1, b1 = _fold_bn_np(p["Conv_0"]["kernel"], p["BatchNorm_0"],
                         s["BatchNorm_0"])
    out["w1"] = jnp.asarray(k1.reshape(256, 128), dtype)
    out["b1"] = jnp.asarray(b1.reshape(1, 128), jnp.float32)

    k2, b2 = _fold_bn_np(p["Conv_1"]["kernel"], p["BatchNorm_1"],
                         s["BatchNorm_1"])          # (3, 3, 128, 128)
    w2 = np.zeros((2048, 128), np.float64)
    for bi, (m, n) in enumerate(((-1, -1), (-1, 0), (0, -1), (0, 0))):
        for pp in range(2):
            for q in range(2):
                ky, kx = 2 * m + pp + 1, 2 * n + q + 1
                if 0 <= ky <= 2 and 0 <= kx <= 2:
                    r = bi * 512 + (pp * 2 + q) * 128
                    w2[r:r + 128] = k2[ky, kx]
    out["w2"] = jnp.asarray(w2, dtype)
    out["b2"] = jnp.asarray(b2.reshape(1, 128), jnp.float32)

    k3, b3 = _fold_bn_np(p["Conv_2"]["kernel"], p["BatchNorm_2"],
                         s["BatchNorm_2"])
    out["w3"] = jnp.asarray(k3.reshape(128, 512), dtype)
    out["b3"] = jnp.asarray(b3.reshape(1, 512), jnp.float32)

    kd, bd = _fold_bn_np(p["Conv_3"]["kernel"], p["BatchNorm_3"],
                         s["BatchNorm_3"])
    out["wds"] = jnp.asarray(kd.reshape(256, 512), dtype)
    out["bds"] = jnp.asarray(bd.reshape(1, 512), jnp.float32)

    # even-column selector, broadcast over the 32-row batch dim:
    # sel[u, v', v] = 1 iff v == 2v'  (and the odd variant)
    sel = np.zeros((2, 32, 24, 48), np.float64)
    sel[0, :, np.arange(24), 2 * np.arange(24)] = 1.0
    sel[1, :, np.arange(24), 2 * np.arange(24) + 1] = 1.0
    out["sel0"] = jnp.asarray(sel[0], dtype)
    out["sel1"] = jnp.asarray(sel[1], dtype)
    return out


def _col_select(sel, rows, dtype):
    """(32, 24, 48) @ (32, 48, C) -> (32, 24, C): the sublane-stride-2
    gather as a batched selection matmul (Mosaic has no strided reads)."""
    return jax.lax.dot_general(
        sel, rows, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dtype)


def _bridge_kernel(x_ref, w1, b1, w2, b2, w3, b3, wds, bds, s0, s1,
                   out_ref, hs_ref, im_ref, *, S, dtype):
    w1v, w2v, w3v, wdsv = w1[...], w2[...], w3[...], wds[...]
    b1v, b2v, b3v, bdsv = b1[...], b2[...], b3[...], bds[...]
    s0v, s1v = s0[...], s1[...]
    for s in range(S):
        y = x_ref[s:s + 1].reshape(64 * 48, 256)
        h1 = jax.nn.relu(jnp.dot(
            y, w1v, preferred_element_type=jnp.float32) + b1v).astype(dtype)
        # phase-split h1 (64,48,128) -> hs (32*24, (p,q)*128):
        # row parity = free leading split; column parity = select matmul
        h4 = h1.reshape(32, 2, 48, 128)
        for pp in range(2):
            rows = h4[:, pp]                       # (32, 48, 128)
            for q, sel in ((0, s0v), (1, s1v)):
                hs_ref[:, (pp * 2 + q) * 128:(pp * 2 + q + 1) * 128] = (
                    _col_select(sel, rows, dtype).reshape(32 * 24, 128))
        # downsample input phase (0,0) of the ORIGINAL y (256 ch)
        y4 = y.reshape(32, 2, 48, 256)
        yds = _col_select(s0v, y4[:, 0], dtype).reshape(32 * 24, 256)
        # 3x3/2 conv: im2col over (m, n) in {-1,0}^2 shifts of the
        # phase-split 32x24 grid (pad top/left, then unit slices)
        hsv = hs_ref[...].reshape(1, 32, 24, 512)
        hp = jnp.pad(hsv, ((0, 0), (1, 0), (1, 0), (0, 0)))
        for bi, (m, n) in enumerate(((-1, -1), (-1, 0), (0, -1), (0, 0))):
            im_ref[:, bi * 512:(bi + 1) * 512] = (
                hp[:, 1 + m:33 + m, 1 + n:25 + n, :]
                .reshape(32 * 24, 512))
        h2 = jax.nn.relu(jnp.dot(
            im_ref[...], w2v,
            preferred_element_type=jnp.float32) + b2v).astype(dtype)
        o = jnp.dot(h2, w3v, preferred_element_type=jnp.float32) + b3v
        o = o + jnp.dot(yds, wdsv,
                        preferred_element_type=jnp.float32) + bdsv
        out_ref[s:s + 1] = jax.nn.relu(o).astype(dtype).reshape(
            1, 32, 24, 512)


def bridge_pallas(x, weights: Dict[str, jnp.ndarray],
                  interpret: bool | None = None, group: int = 1):
    """x (B, 64, 48, 256) bf16 (layer1 output) -> (B, 32, 24, 512) bf16
    (block2_0 output)."""
    B = x.shape[0]
    dtype = x.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    S = group
    while B % S:
        S //= 2
    S = max(S, 1)
    args = [weights[k] for k in ("w1", "b1", "w2", "b2", "w3", "b3",
                                 "wds", "bds", "sel0", "sel1")]
    kernel = partial(_bridge_kernel, S=S, dtype=dtype)
    return pl.pallas_call(
        kernel,
        grid=(B // S,),
        in_specs=[pl.BlockSpec((S, 64, 48, 256), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd,
                        memory_space=pltpu.VMEM) for a in args],
        out_specs=pl.BlockSpec((S, 32, 24, 512), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 32, 24, 512), dtype),
        scratch_shapes=[
            pltpu.VMEM((32 * 24, 512), dtype),     # phase-split h1
            pltpu.VMEM((32 * 24, 2048), dtype),    # 3x3/2 im2col
        ],
        interpret=interpret,
    )(x, *args)


def bridge_reference(variables, x):
    """jnp oracle: flax Bottleneck_3 math (1x1 -> 3x3/2 -> 1x1 + ds)."""
    p = variables["params"]["ResNet_0"]["Bottleneck_3"]
    s = variables["batch_stats"]["ResNet_0"]["Bottleneck_3"]

    def cbr(x, ci, strides, relu=True):
        k, b = _fold_bn_np(p[f"Conv_{ci}"]["kernel"], p[f"BatchNorm_{ci}"],
                           s[f"BatchNorm_{ci}"])
        kh = np.asarray(k).shape[0]
        pad = ((kh // 2, kh // 2),) * 2   # the model's explicit padding=1
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), jnp.asarray(k, jnp.float32), strides,
            pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + jnp.asarray(b, jnp.float32)
        return jax.nn.relu(y) if relu else y

    h = cbr(x, 0, (1, 1))
    h = cbr(h.astype(jnp.bfloat16), 1, (2, 2))
    h = cbr(h.astype(jnp.bfloat16), 2, (1, 1), relu=False)
    ds = cbr(x, 3, (2, 2), relu=False)
    return jax.nn.relu(h + ds).astype(jnp.bfloat16)


def make_bridge_interceptor(variables, dtype=jnp.bfloat16,
                            group: int = 1):
    """Swap Bottleneck_3 (block2_0) for the bridge kernel."""
    w = fold_bridge_weights(variables, dtype=dtype)

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (context.method_name == "__call__"
                and type(mod).__name__ == "Bottleneck"
                and (mod.name or "") == "Bottleneck_3"):
            x = args[0]
            if x.shape[-1] > 256:      # lane pad from the layer1 kernel
                x = x[..., :256]
            return bridge_pallas(x.astype(dtype), w, group=group)
        return next_fun(*args, **kwargs)

    return interceptor
