"""Int8 Pallas kernels for the SimpleBaseline deconv head (3x
ConvTranspose 4x4/2 + BN + relu, then the final 1x1 heatmap conv) —
the tail of the ALL-Pallas R50 serving engine (ops/pallas_engine.py).

A stride-2 transposed conv splits into four output PHASES, each a 2x2
conv of the input (the transpose of the stem kernel's phase trick,
ops/pallas_stem.py). For flax/lax conv_transpose(k=4, s=2, 'SAME',
transpose_kernel=False) the dilated-space padding is (2, 2)
(jax _conv_transpose_padding), which gives exactly:

  out[2i]   = x[i-1] @ w[0] + x[i]   @ w[2]
  out[2i+1] = x[i]   @ w[1] + x[i+1] @ w[3]          (per axis)

so phase (p, q) is ONE (4*Cin)-deep matmul over the 2x2 shift im2col,
with weight rows [(my, mx) shift][cin] = w[ty, tx] per the table above.
Phases are requantized to the deconv's calibrated output scale, then
interleaved back to (2H, 2W): columns via batched 0/1 selector matmuls
in bf16 (exact for int8 values; Mosaic has no strided writes —
scripts/r4_probe_engine.py R4 FAIL), rows via leading-dim unit writes
(probe R3 OK).

Each deconv is its own pallas_call (deconv0's phase weights alone are
8.4 MB int8 — VMEM-budget reasons, see ops/pallas_stages.py); the final
1x1 conv rides in the last deconv's kernel and emits f32 heatmaps
padded to 32 lanes.

Reference counterpart: the torch head semantics live in
/root/reference/pose/pose/models/heads (deconv + final conv); this is
the TPU-specific serving implementation of the same math.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from itertools import product
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpupose.ops.pallas_stages import QMAX, quantize_per_col

# per output parity: (input shift, kernel tap) pairs along one axis
_TAPS = (((-1, 0), (0, 2)), ((0, 1), (1, 3)))


@dataclass
class DeconvSpec:
    """One transposed-conv pallas_call (+ optional fused final conv)."""

    args: List[jnp.ndarray]
    h: int                      # input spatial
    w: int
    cin: int
    cout: int
    final_cout: int = 0         # lanes of the fused final conv (0 = none)


def fold_deconv(kernel, bias, s_in: float, s_out: float
                ) -> List[jnp.ndarray]:
    """kernel (4, 4, Cin, O) folded-BN f32, bias (O,) -> flat arg list:
    packed int8 phase weights + requant vectors. s_in/s_out are the
    calibrated activation scales of the input and output tensors."""
    k = np.asarray(kernel, np.float64)
    b = np.asarray(bias, np.float64)
    _, _, cin, o = k.shape
    args: List[jnp.ndarray] = []
    for p in range(2):
        for q in range(2):
            w = np.zeros((4 * cin, o), np.float64)
            for bi, ((my, ty), (mx, tx)) in enumerate(
                    product(_TAPS[p], _TAPS[q])):
                w[bi * cin:(bi + 1) * cin] = k[ty, tx]
            wq, sw = quantize_per_col(w)
            args.append(jnp.asarray(wq))
            args.append(jnp.asarray((s_in * sw / s_out).reshape(1, -1),
                                    jnp.float32))
    args.append(jnp.asarray((b / s_out).reshape(1, -1), jnp.float32))
    return args


def _make_interleave_sel(rows: int, w: int, dtype=jnp.bfloat16):
    """selI[u, v, j] = 1 iff v == 2j (+1): scatter phase columns to the
    even/odd columns of the doubled-width output."""
    sel = np.zeros((2, rows, 2 * w, w), np.float64)
    sel[0, :, 2 * np.arange(w), np.arange(w)] = 1.0
    sel[1, :, 2 * np.arange(w) + 1, np.arange(w)] = 1.0
    return jnp.asarray(sel[0], dtype), jnp.asarray(sel[1], dtype)


def build_deconv_spec(kernel, bias, s_in, s_out,
                      final: Optional[tuple] = None) -> DeconvSpec:
    """final = (kernel (1,1,C,K), bias, s_in_final) fuses the heatmap
    conv into this deconv's kernel (f32 output, lanes padded to 32)."""
    k = np.asarray(kernel)
    cin, o = k.shape[2], k.shape[3]
    args = fold_deconv(kernel, bias, s_in, s_out)
    final_cout = 0
    if final is not None:
        kf, bf, sf = final
        kf = np.asarray(kf, np.float64).reshape(kf.shape[-2], kf.shape[-1])
        bf = np.asarray(bf, np.float64)
        final_cout = int(np.ceil(kf.shape[1] / 32)) * 32
        kf = np.pad(kf, ((0, 0), (0, final_cout - kf.shape[1])))
        bf = np.pad(bf, (0, final_cout - bf.shape[0]))
        wfq, swf = quantize_per_col(kf)
        args.append(jnp.asarray(wfq))
        args.append(jnp.asarray((sf * swf).reshape(1, -1), jnp.float32))
        args.append(jnp.asarray(bf.reshape(1, -1), jnp.float32))
    return DeconvSpec(args, 0, 0, cin, o, final_cout)


def _i8dot(a, w):
    return jax.lax.dot_general(
        a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)


def _deconv_kernel(x_ref, *refs, spec: DeconvSpec, g: int):
    h, w, cin, o = spec.h, spec.w, spec.cin, spec.cout
    has_final = spec.final_cout > 0
    im_ref = refs[-1]
    y_ref = refs[-2] if has_final else None
    out_ref = refs[-3] if has_final else refs[-2]
    wrefs = refs[:-3] if has_final else refs[:-2]
    sel0 = wrefs[-2][...]
    sel1 = wrefs[-1][...]
    wrefs = wrefs[:-2]
    if has_final:
        wf, mf, bf = (wrefs[-3][...], wrefs[-2][...], wrefs[-1][...])
        wrefs = wrefs[:-3]
    bvec = wrefs[8][...]
    rows = g * h * w

    x4 = x_ref[...].reshape(g, h, w, cin)
    hp = jnp.pad(x4, ((0, 0), (1, 1), (1, 1), (0, 0)))
    phases = {}
    for p in range(2):
        for q in range(2):
            wq = wrefs[2 * (p * 2 + q)][...]
            mv = wrefs[2 * (p * 2 + q) + 1][...]
            for bi, ((my, _), (mx, _)) in enumerate(
                    product(_TAPS[p], _TAPS[q])):
                im_ref[:rows, bi * cin:(bi + 1) * cin] = (
                    hp[:, 1 + my:1 + my + h, 1 + mx:1 + mx + w, :]
                    .reshape(rows, cin))
            acc = _i8dot(im_ref[:rows, :4 * cin], wq)
            v = acc.astype(jnp.float32) * mv + bvec
            phases[(p, q)] = jnp.clip(
                jnp.round(jnp.maximum(v, 0.0)), 0.0, QMAX
            ).astype(jnp.int8).reshape(g * h, w, o)

    tgt = y_ref if has_final else out_ref
    for p in range(2):
        z = (jax.lax.dot_general(
                sel0, phases[(p, 0)].astype(jnp.bfloat16),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
             + jax.lax.dot_general(
                sel1, phases[(p, 1)].astype(jnp.bfloat16),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32))
        z = z.astype(jnp.int8).reshape(g, h, 2 * w, o)
        for i in range(h):
            tgt[:, 2 * i + p] = z[:, i]

    if has_final:
        yv = y_ref[...].reshape(g * 2 * h * 2 * w, o)
        acc = _i8dot(yv, wf)
        out_ref[...] = (acc.astype(jnp.float32) * mf + bf).reshape(
            g, 2 * h, 2 * w, spec.final_cout)


def run_deconv(x, spec: DeconvSpec, g: int = 1,
               interpret: Optional[bool] = None):
    """x (B, H, W, Cin) int8 -> (B, 2H, 2W, Cout) int8, or f32 heatmaps
    (B, 2H, 2W, final_cout) when the final conv is fused."""
    B, h, w, cin = x.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    while B % g:
        g //= 2
    g = max(g, 1)
    sp = DeconvSpec(spec.args, h, w, cin, spec.cout, spec.final_cout)
    sel0, sel1 = _make_interleave_sel(g * h, w)
    args = list(sp.args) + [sel0, sel1]
    has_final = sp.final_cout > 0
    out_dtype = jnp.float32 if has_final else jnp.int8
    out_c = sp.final_cout if has_final else sp.cout
    scratch = [pltpu.VMEM((g * h * w, 4 * cin), jnp.int8)]
    if has_final:
        scratch.insert(0, pltpu.VMEM((g, 2 * h, 2 * w, sp.cout),
                                     jnp.int8))
    kernel = partial(_deconv_kernel, spec=sp, g=g)
    return pl.pallas_call(
        kernel,
        grid=(B // g,),
        in_specs=[pl.BlockSpec((g, h, w, cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd,
                        memory_space=pltpu.VMEM) for a in args],
        out_specs=pl.BlockSpec((g, 2 * h, 2 * w, out_c),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2 * h, 2 * w, out_c),
                                       out_dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(x, *args)


def deconv_oracle(x, spec: DeconvSpec, h: int, w: int):
    """jnp mirror of _deconv_kernel (f32 matmuls on int values)."""
    B = x.shape[0]
    cin, o = spec.cin, spec.cout
    has_final = spec.final_cout > 0
    args = [a.astype(jnp.float32) for a in spec.args]
    bvec = args[8]
    xf = x.astype(jnp.float32).reshape(B, h, w, cin)
    hp = jnp.pad(xf, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((B, 2 * h, 2 * w, o), jnp.float32)
    for p in range(2):
        for q in range(2):
            wq = args[2 * (p * 2 + q)]
            mv = args[2 * (p * 2 + q) + 1]
            im = jnp.concatenate(
                [hp[:, 1 + my:1 + my + h, 1 + mx:1 + mx + w, :]
                 for ((my, _), (mx, _)) in product(_TAPS[p], _TAPS[q])],
                axis=-1)
            acc = jnp.einsum("bhwc,co->bhwo", im, wq)
            v = jnp.clip(jnp.round(jnp.maximum(acc * mv + bvec, 0.0)),
                         0, QMAX)
            out = out.at[:, p::2, q::2, :].set(v)
    if not has_final:
        return out.astype(jnp.int8)
    wf, mf, bf = args[-3], args[-2], args[-1]
    return jnp.einsum("bhwc,co->bhwo", out, wf) * mf + bf
