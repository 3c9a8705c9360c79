"""Post-training int8 quantization (PTQ) for the inference/serving path.

TPU-native rationale: the v5e MXU multiplies int8 x int8 -> int32 at 394
TOPS vs 197 TFLOPS bf16. Measured end-to-end (including the per-layer
requantize glue a real network pays) the int8 conv path sustains ~1.3x
the bf16 rate at SimpleBaseline-R50 shapes, so quantized serving is a
real throughput lever on top of the bf16 pipeline.

Design — generic over every Flax model in the zoo, no per-model code:

- linen *method interception* (`nn.intercept_methods`) swaps each
  `nn.Conv`/`nn.Dense` `__call__` for an int8 kernel at trace time (Dense
  covers the ConvNeXt pointwise MLPs and the ViT qkv/proj/MLP layers
  where the DINOv3 families spend their FLOPs). The model
  definitions stay untouched; the params tree stays fp32 and remains the
  single source of truth (weights are requantized inside the program —
  elementwise over weights, noise vs. the conv FLOPs, and XLA hoists it
  out of any scan).
- weights: per-output-channel symmetric int8 (max-abs scaling).
- activations: per-tensor symmetric int8; scales come from a max-abs
  *calibration* pass (`calibrate`) over representative batches.
- `nn.ConvTranspose` deconvs (the SimpleBaseline/ViTPose head, ~half the
  R50 head FLOPs) quantize too, via an lhs-dilated int8 conv (measured
  ~+1-2% e2e on R50 — the dilated form doesn't reach the dense conv's
  int8 rate, but it removes the bf16 island; keypoint decode stays
  within 1 px, tests/test_quant.py).
- everything else — BatchNorm, relu, residual adds, pooling, the DARK
  decode — stays in bf16/fp32: those are bandwidth-bound and
  accuracy-critical, not MXU-bound.
- convs the MXU cannot profitably run in int8 (grouped/depthwise,
  dilated, masked) silently fall back to the module's own bf16 path, so
  ConvNeXt/HRNet quantize their 1x1/3x3 dense convs and keep depthwise
  in bf16.

The reference has no quantization story (fp16 AMP only,
HPE/train.py:85); this is a beyond-parity serving feature.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

QMAX = 127.0


def _pair(v):
    if v is None:
        return (1, 1)
    if isinstance(v, int):
        return (v, v)
    return tuple(v)


def _conv_padding(mod: nn.Conv):
    """Canonicalize flax nn.Conv padding to what lax.conv accepts, or None
    if unsupported (-> bf16 fallback)."""
    p = mod.padding
    if isinstance(p, str):
        return p if p in ("SAME", "VALID") else None
    if isinstance(p, int):
        return ((p, p), (p, p))
    if isinstance(p, (tuple, list)) and len(p) == 2:
        out = []
        for e in p:
            if isinstance(e, int):
                out.append((e, e))
            elif isinstance(e, (tuple, list)) and len(e) == 2:
                out.append(tuple(e))
            else:
                return None
        return tuple(out)
    return None


def _quantizable(mod) -> bool:
    if isinstance(mod, nn.Dense):
        return True
    if isinstance(mod, nn.ConvTranspose):
        # the SimpleBaseline/ViTPose deconv stack: ~half the R50 head
        # FLOPs; lowers to an lhs-dilated int8 conv on the MXU
        return (len(mod.kernel_size) == 2
                and not mod.transpose_kernel
                and _pair(mod.kernel_dilation) == (1, 1)
                and isinstance(mod.padding, str)
                and mod.padding in ("SAME", "VALID"))
    return (isinstance(mod, nn.Conv)
            and len(mod.kernel_size) == 2
            and mod.feature_group_count == 1
            and mod.mask is None
            and _pair(mod.input_dilation) == (1, 1)
            and _pair(mod.kernel_dilation) == (1, 1)
            and _conv_padding(mod) is not None)


def _params_at(params: Mapping, path) -> Mapping:
    node = params
    for name in path:
        node = node[name]
    return node


def quantize_weight(kernel):
    """fp kernel (..., I, O) -> (int8 kernel, per-out-channel fp32 scale
    (O,)): symmetric max-abs per output channel. Works for conv
    (Kh, Kw, I, O) and dense (I, O) layouts — O is always last."""
    k = kernel.astype(jnp.float32)
    ws = jnp.maximum(jnp.max(jnp.abs(k), axis=tuple(range(k.ndim - 1))), 1e-8)
    wq = jnp.round(k / ws * QMAX).astype(jnp.int8)
    return wq, ws


def quantize_activation(x, scale: float):
    """fp activations -> int8 with the calibrated per-tensor scale."""
    q = jnp.round(x.astype(jnp.float32) * (QMAX / scale))
    return jnp.clip(q, -QMAX, QMAX).astype(jnp.int8)


def _int8_conv(mod: nn.Conv, params: Mapping, x, scale: float):
    kernel = _params_at(params, mod.path)["kernel"]
    wq, ws = quantize_weight(kernel)
    xq = quantize_activation(x, scale)
    y = jax.lax.conv_general_dilated(
        xq, wq, _pair(mod.strides), _conv_padding(mod),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (ws * (scale / (QMAX * QMAX)))
    if mod.use_bias:
        y = y + _params_at(params, mod.path)["bias"].astype(jnp.float32)
    out_dtype = mod.dtype if mod.dtype is not None else x.dtype
    return y.astype(out_dtype)


def _int8_conv_transpose(mod: nn.ConvTranspose, params: Mapping, x,
                         scale: float):
    leaf = _params_at(params, mod.path)
    wq, ws = quantize_weight(leaf["kernel"])          # (Kh, Kw, I, O)
    xq = quantize_activation(x, scale)
    y = jax.lax.conv_transpose(
        xq, wq, _pair(mod.strides), mod.padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=False, preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (ws * (scale / (QMAX * QMAX)))
    if mod.use_bias:
        y = y + leaf["bias"].astype(jnp.float32)
    out_dtype = mod.dtype if mod.dtype is not None else x.dtype
    return y.astype(out_dtype)


def _int8_dense(mod: nn.Dense, params: Mapping, x, scale: float):
    leaf = _params_at(params, mod.path)
    wq, ws = quantize_weight(leaf["kernel"])          # (I, O), (O,)
    xq = quantize_activation(x, scale)
    y = jax.lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (ws * (scale / (QMAX * QMAX)))
    if mod.use_bias:
        y = y + leaf["bias"].astype(jnp.float32)
    out_dtype = mod.dtype if mod.dtype is not None else x.dtype
    return y.astype(out_dtype)


def make_quant_interceptor(variables: Mapping, scales: Mapping[str, float]):
    """Interceptor running every calibrated, quantizable nn.Conv/nn.Dense
    in int8."""
    params = variables["params"]

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (context.method_name != "__call__"
                or not isinstance(mod, (nn.Conv, nn.ConvTranspose,
                                        nn.Dense))):
            return next_fun(*args, **kwargs)
        path = "/".join(mod.path)
        scale = scales.get(path)
        if scale is None or not _quantizable(mod):
            return next_fun(*args, **kwargs)
        if isinstance(mod, nn.Dense):
            return _int8_dense(mod, params, args[0], float(scale))
        if isinstance(mod, nn.ConvTranspose):
            return _int8_conv_transpose(mod, params, args[0], float(scale))
        return _int8_conv(mod, params, args[0], float(scale))

    return interceptor


def quantized_apply(apply_fn: Callable, variables: Mapping,
                    scales: Mapping[str, float], *args, **kwargs):
    """Run `apply_fn(variables, *args, **kwargs)` with calibrated convs in
    int8. Interceptors act at trace time, so wrapping the call INSIDE a
    jitted function compiles the int8 program."""
    with nn.intercept_methods(make_quant_interceptor(variables, scales)):
        return apply_fn(variables, *args, **kwargs)


def calibrate(apply_fn: Callable, variables: Mapping,
              batches: Iterable, preprocess: Callable = None,
              **apply_kwargs) -> Dict[str, float]:
    """Max-abs activation calibration.

    Runs the model over `batches` (each already a model-input array, or
    raw arrays mapped through `preprocess` inside the jitted pass) and
    records, per quantizable conv, the running max |input|. Returns
    {conv_path: amax} — the `scales` for `quantized_apply`. One jitted
    program; only K scalars come back per batch.
    """

    def run(batch):
        rec: Dict[str, jnp.ndarray] = {}

        def interceptor(next_fun, args, kwargs, context):
            mod = context.module
            if (context.method_name == "__call__"
                    and isinstance(mod, (nn.Conv, nn.ConvTranspose,
                                         nn.Dense))
                    and _quantizable(mod)):
                path = "/".join(mod.path)
                amax = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
                rec[path] = jnp.maximum(rec[path], amax) \
                    if path in rec else amax
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(interceptor):
            x = preprocess(batch) if preprocess is not None else batch
            apply_fn(variables, x, **apply_kwargs)
        return rec

    jrun = jax.jit(run)
    amax: Dict[str, float] = {}
    for b in batches:
        got = jax.device_get(jrun(jnp.asarray(b)))
        for k, v in got.items():
            amax[k] = max(amax.get(k, 0.0), float(v))
    if not amax:
        raise ValueError("calibration saw no quantizable nn.Conv layers")
    return amax
