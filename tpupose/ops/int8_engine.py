"""Fused int8 serving engine: int8 activations END-TO-END.

Why this exists (measured on TPU v5e, scripts/profile_r50.py): the bf16
SimpleBaseline-R50 256x192 inference program runs at the HBM roofline —
55.2 MB/img at 837 GB/s effective, arithmetic intensity 141 flops/byte
vs the v5e ridge point of ~240 — so the MXU is only ~60% busy and no
amount of compute tuning helps. The intercept-based PTQ path
(ops/quant.py) puts the convs on the int8 MXU but keeps every
inter-layer activation in bf16 (52.7 MB/img): still bandwidth-bound.

The engine is an inference *build step* (the TensorRT analog, TPU
flavor): fold everything affine into the convolutions, run every conv
on the int8 MXU, and pick each activation's storage dtype.

Storage policy — MEASURED on v5e (round 3, scripts/mixed_store_sweep.py
+ /tmp probes; batch 128 R50 256x192):
  - all-int8 storage:       10.9-11.7k img/s, 34-40 MB/img
  - mixed (>=128ch int8):   11.2-12.3k img/s
  - all-bf16 storage:       14.3k img/s,      53 MB/img   <- DEFAULT
Despite the byte cut, int8-STORED activations lose badly: int8 tiles
are (32 sublane x 128 lane), so every tensor with <128 channels wastes
half its lanes and the requant/dequant chains around int8 tensors cost
VPU time the bandwidth saving never pays back. bf16 storage with
quantize-on-read (the ops/quant.py intercept recipe) keeps the int8
MXU win on the convs (l2/l3/l4 run ~2x bf16) without the storage tax;
`min_int8_channels` remains a knob for HBM-constrained deployments.
Weights bake into the program as constants by default — measured +5-6%
(XLA pre-packs constant conv operands into the MXU layout at compile
time); `weights_as_args=True` keeps them as runtime buffers for
embedding in larger programs. The engine's remaining enduring value:
the folded uint8 normalize (zero input-quantization error) and the
self-contained, model-code-free conv DAG. Mechanics:

  - BatchNorm folds into the conv weights/bias (W' = W*g/sqrt(v+eps)).
  - The ImageNet uint8 normalize folds into the first conv: x_i8 =
    x - 128 is EXACT int8 (no input quantization error at all); the
    per-channel 1/(255*std) becomes a per-input-channel weight scale
    and the mean/128 shift becomes bias. First-conv spatial padding
    uses the per-channel int8 value that maps to normalized 0.
  - every conv runs int8 x int8 -> int32 on the MXU
    (preferred_element_type), then one fused fp32 epilogue:
    acc * (act_scale * w_scale_oc) + bias -> relu -> round/clip back to
    int8 with the NEXT layer's calibrated scale. XLA fuses the whole
    epilogue into the conv, so the tensor that hits HBM is 1 byte/elem.
  - residual/fuse adds dequantize int8 tensors, add in fp32, relu,
    requantize — fused elementwise glue, no bf16 tensor materializes.
  - maxpool and nearest-upsample run directly on int8 (scale-invariant).
  - deconvs (the SimpleBaseline head) run as int8 transposed convs.
  - only the final 1x1 heatmap conv emits fp32, feeding the fused DARK
    decode (ops/decode.py).

Calibration runs the SAME folded graph in fp32, recording max-|x| at
every point that will be stored int8 — one jitted pass per batch.

Weight quantization is per-output-channel symmetric (max-abs),
activations per-tensor symmetric, like ops/quant.py.

The build step is graph-IR-driven: `fold_simple_baseline` walks the
Flax param tree of models/simple_baseline.py (ResNet-18..152 backbone +
deconv HeatmapHead) into a linear chain; `fold_hrnet_pose` walks
models/backbones/hrnet.py (multi-branch stages, cross-resolution fuse
sums, nearest upsampling) into a DAG. Any trained checkpoint of either
family serves through `Int8Engine.build` unchanged. The reference has
no serving path at all (its predictor/exporter are empty files —
SURVEY.md §2.11); this is the beyond-parity deployment story, and the
quantization recipe matches what its CUDA ecosystem gets from TensorRT
PTQ.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpupose.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD
from tpupose.ops.quant import QMAX, quantize_weight


# ---------------------------------------------------------------------------
# graph IR
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ConvSpec:
    """One folded convolution. `name` keys into the prepared-weights dict.

    deconv=True runs the kernel as a stride-2 'SAME' transposed conv
    (flax ConvTranspose semantics). relu is applied inside the fused
    epilogue."""

    name: str
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))
    relu: bool = True
    deconv: bool = False


@dataclass(frozen=True)
class Node:
    """One graph op. kinds:

    conv      inputs=(x,)      folded conv per `spec`
    maxpool   inputs=(x,)      3x3/2 pad-1 max pool (int8-safe)
    add       inputs=(a,b,..)  fp32 sum of dequantized inputs [+ relu]
    upsample  inputs=(x,)      nearest by integer `factor` (relayout)

    quant=True means the output has a calibrated scale; `store` then
    picks its HBM representation: "int8" (1 byte/elem, requant in the
    producer's epilogue) or "bf16" (real units, quantized on read by the
    consuming conv). quant=False leaves it fp32 (the final heatmap conv).

    Why two stores (measured, v5e, scripts/engine_segments.py round 3):
    int8 tensors tile as (32 sublane x 128 lane); a 64-channel tensor
    wastes half the lanes of every op touching it and layer1 of R50 ran
    at ~6% MXU — 4.35 ms of an 11.4 ms forward — while the bf16-stored
    intercept path (ops/quant.py) cruised through the same layers.
    Narrow tensors therefore store bf16; wide ones (>=128 ch) keep the
    int8 byte savings."""

    kind: str
    out: str
    inputs: Tuple[str, ...]
    spec: Optional[ConvSpec] = None
    quant: bool = True
    store: str = "int8"            # "int8" | "bf16" (when quant=True)
    relu: bool = False
    factor: Tuple[int, int] = (1, 1)
    # upsample target: the tensor id whose spatial dims to match. With it,
    # non-integer ratios fall back to nearest resize exactly like the
    # model's _upsample_to (models/backbones/hrnet.py:29); without it the
    # integer `factor` is used.
    like: Optional[str] = None


class GraphBuilder:
    """Emit Nodes in topological order; returns tensor ids."""

    def __init__(self):
        self.nodes: List[Node] = []
        self.weights: Dict[str, tuple] = {}
        self._n = 0

    def _fresh(self) -> str:
        self._n += 1
        return f"t{self._n}"

    def conv(self, x: str, name: str, kernel, bias, *, strides=(1, 1),
             padding=((0, 0), (0, 0)), relu=True, deconv=False,
             quant=True) -> str:
        self.weights[name] = (kernel, bias)
        out = self._fresh()
        self.nodes.append(Node("conv", out, (x,),
                               ConvSpec(name, tuple(strides), padding,
                                        relu, deconv), quant=quant))
        return out

    def add(self, xs: Sequence[str], relu=True) -> str:
        out = self._fresh()
        self.nodes.append(Node("add", out, tuple(xs), relu=relu))
        return out

    def maxpool(self, x: str) -> str:
        out = self._fresh()
        self.nodes.append(Node("maxpool", out, (x,)))
        return out

    def upsample(self, x: str, factor: Tuple[int, int],
                 like: Optional[str] = None) -> str:
        out = self._fresh()
        self.nodes.append(Node("upsample", out, (x,), factor=factor,
                               like=like))
        return out


# ---------------------------------------------------------------------------
# folding
# ---------------------------------------------------------------------------

def _fold_bn(kernel, bn_params, bn_stats, eps: float = 1e-5):
    """conv kernel (..., O) + BatchNorm -> (folded fp32 kernel, bias (O,))."""
    g = bn_params["scale"].astype(jnp.float32)
    b = bn_params["bias"].astype(jnp.float32)
    mu = bn_stats["mean"].astype(jnp.float32)
    var = bn_stats["var"].astype(jnp.float32)
    f = g / jnp.sqrt(var + eps)
    return kernel.astype(jnp.float32) * f, b - mu * f


def _fold_input_normalize(kernel, bias, mean, std):
    """Fold the uint8 ImageNet normalize into the network's first conv.

    The engine feeds x_i8 = pixel - 128 (exact int8). The normalized
    value is alpha*(x_i8) + beta with alpha = 1/(255*std) and
    beta = (128/255 - mean)/std; alpha scales the kernel's input
    channels and the beta term (constant across pixels because padding
    uses the beta-zero pixel) folds into the bias."""
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    alpha = 1.0 / (255.0 * s)
    beta = (128.0 / 255.0 - m) / s
    k_in = kernel * alpha[None, None, :, None]
    b_in = bias + jnp.einsum("hwio,i->o", kernel, beta)
    pad = np.clip(np.round(255.0 * np.asarray(mean) - 128.0),
                  -128, 127).astype(np.int8)
    return k_in, b_in, pad


def _emit_residual_block(g: GraphBuilder, x: str, bp, bs, base: str,
                         strides: Tuple[int, int]) -> str:
    """BasicBlock/Bottleneck (models/backbones/resnet.py) -> graph nodes.

    The block's conv count identifies the variant: BasicBlock holds
    Conv_0..1 (+Conv_2 projection), Bottleneck Conv_0..2 (+Conv_3)."""
    n_convs = sum(1 for k in bp if k.startswith("Conv_"))
    basic = _is_basic(bp)
    n_main = 2 if basic else 3          # main-path convs; extras = projection
    has_proj = n_convs > n_main

    def fold(i):
        return _fold_bn(bp[f"Conv_{i}"]["kernel"], bp[f"BatchNorm_{i}"],
                        bs[f"BatchNorm_{i}"])

    y = x
    if basic:
        k, b = fold(0)
        y = g.conv(y, f"{base}/c0", k, b, strides=strides,
                   padding=((1, 1), (1, 1)))
        k, b = fold(1)
        y = g.conv(y, f"{base}/c1", k, b, padding=((1, 1), (1, 1)),
                   relu=False)
    else:
        k, b = fold(0)
        y = g.conv(y, f"{base}/c0", k, b)
        k, b = fold(1)
        y = g.conv(y, f"{base}/c1", k, b, strides=strides,
                   padding=((1, 1), (1, 1)))
        k, b = fold(2)
        y = g.conv(y, f"{base}/c2", k, b, relu=False)
    res = x
    if has_proj:
        k, b = fold(n_main)
        res = g.conv(x, f"{base}/proj", k, b, strides=strides, relu=False)
    return g.add((y, res), relu=True)


def _is_basic(block_params) -> bool:
    """BasicBlock's Conv_1 is 3x3; Bottleneck's Conv_1 is the 3x3 mid conv
    but its Conv_0 is 1x1 — distinguish on Conv_0's spatial shape."""
    return block_params["Conv_0"]["kernel"].shape[0] == 3


def fold_simple_baseline(variables, backbone: str = "resnet50",
                         mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """SimpleBaseline (ResNet + deconv HeatmapHead) -> (nodes, weights,
    stem_pad, in_pad). The first conv eats raw `pixel - 128` int8 input;
    in_pad is its spatial padding, applied on the int8 canvas with the
    stem_pad (normalized-zero) pixel value."""
    from tpupose.models.backbones.resnet import resnet_spec

    params = variables["params"]["ResNet_0"]
    stats = variables["batch_stats"]["ResNet_0"]
    block_cls, sizes = resnet_spec(backbone)

    g = GraphBuilder()

    k, b = _fold_bn(params["Conv_0"]["kernel"], params["BatchNorm_0"],
                    stats["BatchNorm_0"])
    k, b, stem_pad = _fold_input_normalize(k, b, mean, std)
    x = g.conv("in", "stem", k, b, strides=(2, 2))
    x = g.maxpool(x)

    prefix = block_cls.__name__
    n = 0
    for i, size in enumerate(sizes):
        for j in range(size):
            strides = (2, 2) if (i > 0 and j == 0) else (1, 1)
            base = f"{prefix}_{n}"
            x = _emit_residual_block(g, x, params[base], stats[base], base,
                                     strides)
            n += 1

    head_p = variables["params"]["HeatmapHead_0"]
    head_s = variables["batch_stats"]["HeatmapHead_0"]
    i = 0
    while f"ConvTranspose_{i}" in head_p:
        k, b = _fold_bn(head_p[f"ConvTranspose_{i}"]["kernel"],
                        head_p[f"BatchNorm_{i}"], head_s[f"BatchNorm_{i}"])
        x = g.conv(x, f"deconv{i}", k, b, strides=(2, 2), deconv=True)
        i += 1
    kf = head_p["Conv_0"]["kernel"].astype(jnp.float32)
    bf = head_p["Conv_0"]["bias"].astype(jnp.float32)
    g.conv(x, "final", kf, bf, relu=False, quant=False)

    return g.nodes, g.weights, stem_pad, (3, 3)


def fold_hrnet_pose(variables, variant: str = "hrnet_w32",
                    mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """HRNetPose (models/backbones/hrnet.py) -> graph IR.

    Mirrors the module's call order exactly (flax auto-numbering):
    stem _ConvBN_0/1, Bottleneck_0..3, transitions _ConvBN_2/3 then
    _ConvBN_4, _ConvBN_5 after each stage, _Stage_k containing
    _Branch_{m*n+i} and _FuseLayer_m per module, the 1x1 head Conv_0."""
    from tpupose.models.backbones.hrnet import HRNET_SPECS

    spec = HRNET_SPECS[variant]
    w, modules = spec["width"], spec["modules"]
    params = variables["params"]["HRNet_0"]
    stats = variables["batch_stats"]["HRNet_0"]

    g = GraphBuilder()

    def convbn(x, scope_p, scope_s, name, *, strides=(1, 1), relu=True):
        k, b = _fold_bn(scope_p["Conv_0"]["kernel"], scope_p["BatchNorm_0"],
                        scope_s["BatchNorm_0"])
        kh = k.shape[0]
        pad = ((kh // 2, kh // 2), (kh // 2, kh // 2))
        return g.conv(x, name, k, b, strides=strides, padding=pad, relu=relu)

    # stem: fold the uint8 normalize into _ConvBN_0
    p0, s0 = params["_ConvBN_0"], stats["_ConvBN_0"]
    k, b = _fold_bn(p0["Conv_0"]["kernel"], p0["BatchNorm_0"],
                    s0["BatchNorm_0"])
    k, b, stem_pad = _fold_input_normalize(k, b, mean, std)
    x = g.conv("in", "stem", k, b, strides=(2, 2))
    x = convbn(x, params["_ConvBN_1"], stats["_ConvBN_1"], "stem1",
               strides=(2, 2))

    for n in range(4):
        base = f"Bottleneck_{n}"
        x = _emit_residual_block(g, x, params[base], stats[base], base,
                                 (1, 1))

    def transition(x, idx, name, *, strides):
        return convbn(x, params[f"_ConvBN_{idx}"], stats[f"_ConvBN_{idx}"],
                      name, strides=strides)

    def run_stage(xs, widths, stage_idx, num_modules, num_blocks=4):
        sp = params[f"_Stage_{stage_idx}"]
        ss = stats[f"_Stage_{stage_idx}"]
        n = len(widths)
        for m in range(num_modules):
            # branches
            ys = []
            for i, x in enumerate(xs):
                bp = sp[f"_Branch_{m * n + i}"]
                bs = ss[f"_Branch_{m * n + i}"]
                y = x
                for blk in range(num_blocks):
                    base = f"BasicBlock_{blk}"
                    y = _emit_residual_block(
                        g, y, bp[base], bs[base],
                        f"s{stage_idx}m{m}b{i}/{base}", (1, 1))
                ys.append(y)
            # fuse: _ConvBN auto-numbering follows the (i, j) loop order
            fp = sp[f"_FuseLayer_{m}"]
            fs = ss[f"_FuseLayer_{m}"]
            cb = iter(range(sum(1 for kk in fp if kk.startswith("_ConvBN_"))))
            outs = []
            for i in range(n):
                terms = []
                for j in range(n):
                    y = ys[j]
                    if j > i:
                        c = next(cb)
                        y = convbn(y, fp[f"_ConvBN_{c}"], fs[f"_ConvBN_{c}"],
                                   f"s{stage_idx}m{m}f{i}{j}", relu=False)
                        f = 2 ** (j - i)
                        y = g.upsample(y, (f, f), like=ys[i])
                    elif j < i:
                        for kstep in range(i - j):
                            last = kstep == i - j - 1
                            c = next(cb)
                            y = convbn(y, fp[f"_ConvBN_{c}"],
                                       fs[f"_ConvBN_{c}"],
                                       f"s{stage_idx}m{m}f{i}{j}k{kstep}",
                                       strides=(2, 2), relu=not last)
                    terms.append(y)
                outs.append(g.add(terms, relu=True))
            xs = outs
        return xs

    b0 = transition(x, 2, "tr0a", strides=(1, 1))
    b1 = transition(x, 3, "tr0b", strides=(2, 2))
    xs = run_stage([b0, b1], (w, w * 2), 0, modules[0])
    xs = xs + [transition(xs[-1], 4, "tr1", strides=(2, 2))]
    xs = run_stage(xs, (w, w * 2, w * 4), 1, modules[1])
    xs = xs + [transition(xs[-1], 5, "tr2", strides=(2, 2))]
    xs = run_stage(xs, (w, w * 2, w * 4, w * 8), 2, modules[2])

    head = variables["params"]["Conv_0"]
    g.conv(xs[0], "final", head["kernel"].astype(jnp.float32),
           head["bias"].astype(jnp.float32), relu=False, quant=False)

    return g.nodes, g.weights, stem_pad, (1, 1)


# ---------------------------------------------------------------------------
# graph execution — one traversal for fp32 calibration and int8 serving
# ---------------------------------------------------------------------------

def _conv_any(x, kernel, spec: ConvSpec, acc_dtype):
    if spec.deconv:
        return jax.lax.conv_transpose(
            x, kernel, spec.strides, "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=False, preferred_element_type=acc_dtype)
    return jax.lax.conv_general_dilated(
        x, kernel, spec.strides, spec.padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dtype)


def _maxpool(x, init):
    return jax.lax.reduce_window(
        x, init, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


def _upsample_nearest(x, target_hw):
    """Nearest upsample to `target_hw` — integer ratios via broadcast +
    reshape (relayout XLA fuses away), anything else via nearest resize:
    the exact semantics of the model's _upsample_to
    (models/backbones/hrnet.py:29), int8-safe (resize nearest is a
    gather)."""
    B, H, W, C = x.shape
    th, tw = target_hw
    fh, fw = th // H, tw // W
    if fh * H == th and fw * W == tw and fh >= 1 and fw >= 1:
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, fh, W, fw, C))
        return x.reshape(B, th, tw, C)
    return jax.image.resize(x, (B, th, tw, C), method="nearest")


def _upsample_target(nd: Node, x, env, unwrap=lambda v: v):
    if nd.like is not None:
        t = unwrap(env[nd.like])
        return (t.shape[1], t.shape[2])
    return (x.shape[1] * nd.factor[0], x.shape[2] * nd.factor[1])


def _stem_int8(images, stem_pad, in_pad):
    """uint8 NHWC -> zero-error int8 with normalized-zero border padding.
    Float pixel inputs (still in [0, 255]) are rounded, not truncated, so
    the engine matches the fp32 path's nearest-integer pixel."""
    if not jnp.issubdtype(images.dtype, jnp.integer):
        images = jnp.round(images)
    x = (images.astype(jnp.int32) - 128).astype(jnp.int8)
    B, H, W, C = x.shape
    ph, pw = in_pad
    canvas = jnp.broadcast_to(jnp.asarray(stem_pad, jnp.int8),
                              (B, H + 2 * ph, W + 2 * pw, C))
    return jax.lax.dynamic_update_slice(canvas, x, (0, ph, pw, 0))


def _forward_calib(nodes, weights, stem_pad, in_pad, images):
    """fp32 folded forward from uint8 (mirrors the int8 dataflow exactly,
    including the exact-integer input representation). Returns
    (final fp32 tensor, amax list in graph order)."""
    env = {"in": _stem_int8(images, stem_pad, in_pad).astype(jnp.float32)}
    amax: List = []
    last = None
    for nd in nodes:
        if nd.kind == "conv":
            k, b = weights[nd.spec.name]
            y = _conv_any(env[nd.inputs[0]], k, nd.spec, jnp.float32) + b
            if nd.spec.relu:
                y = jax.nn.relu(y)
        elif nd.kind == "maxpool":
            y = _maxpool(env[nd.inputs[0]], jnp.float32(-jnp.inf))
        elif nd.kind == "upsample":
            x = env[nd.inputs[0]]
            y = _upsample_nearest(x, _upsample_target(nd, x, env))
        elif nd.kind == "add":
            y = env[nd.inputs[0]]
            for nm in nd.inputs[1:]:
                y = y + env[nm]
            if nd.relu:
                y = jax.nn.relu(y)
        else:  # pragma: no cover
            raise ValueError(nd.kind)
        if nd.quant and nd.kind in ("conv", "add"):
            amax.append(jnp.max(jnp.abs(y)))
        env[nd.out] = y
        last = y
    return last, amax


def _defer_requant(nodes):
    """Graph pass: a quantized conv whose output feeds EXACTLY one `add`
    keeps its fp32 accumulator epilogue — pre-scaled into the add's
    output units — instead of a round/clip/cast requant, hoping XLA
    fuses conv + residual add + single requant into one kernel.

    MEASURED NEGATIVE RESULT (v5e, r50 b128, round 3 — scripts/r3_perf.py):
    XLA does NOT output-fuse the conv with the downstream add on TPU; the
    deferred branches materialize in fp32 and bytes/img GROW 34.4 -> 52.3
    MB, throughput 13.9k -> 10.9k img/s. Kept for the record and gated
    OFF by default (`Int8Engine.build(defer_requant=True)` re-enables for
    future XLA versions)."""
    import dataclasses

    consumers: Dict[str, List[Node]] = {}
    for nd in nodes:
        for nm in nd.inputs:
            consumers.setdefault(nm, []).append(nd)
    out = []
    for nd in nodes:
        cs = consumers.get(nd.out, [])
        if (nd.kind == "conv" and nd.quant and len(cs) == 1
                and cs[0].kind == "add" and cs[0].quant):
            nd = dataclasses.replace(nd, quant=False)
        out.append(nd)
    return out


def _scale_map(nodes, scales):
    """Assign calibrated scales to quantized node outputs (graph order,
    matching _forward_calib's amax recording); also resolve, for each
    UNquantized conv that feeds a single quantized add (the
    _defer_requant pattern), the add scale its epilogue pre-folds."""
    tmap: Dict[str, float] = {}
    it = iter([float(s) / QMAX for s in scales])
    for nd in nodes:
        if nd.quant and nd.kind in ("conv", "add"):
            tmap[nd.out] = next(it)
    deferred: Dict[str, float] = {}
    for nd in nodes:
        if nd.kind == "add" and nd.quant:
            for nm in nd.inputs:
                if nm not in tmap and nm != "in":
                    src = next((s for s in nodes if s.out == nm), None)
                    if src is not None and src.kind == "conv" \
                            and not src.quant:
                        deferred[nm] = tmap[nd.out]
    return tmap, deferred


def _assign_store(nodes, weights, min_int8_channels: int = 128):
    """Storage-policy pass: quantized tensors NARROWER than
    `min_int8_channels` store bf16 instead of int8. Rationale in the
    Node docstring (int8's (32, 128) tiling makes narrow-channel tensors
    pathologically slow — measured 6% MXU on R50 layer1). min=0 keeps
    the classic all-int8 engine."""
    import dataclasses

    ch = {"in": 3}
    out = []
    for nd in nodes:
        if nd.kind == "conv":
            k, _ = weights[nd.spec.name]
            c = int(k.shape[-1])
        else:
            c = ch[nd.inputs[0]]
        ch[nd.out] = c
        if (nd.quant and nd.kind in ("conv", "add")
                and c < min_int8_channels):
            nd = dataclasses.replace(nd, store="bf16")
        out.append(nd)
    return out


def _forward_int8(nodes, qweights, scales, stem_pad, in_pad, images):
    """Mixed-precision pass: env holds (tensor, scale, mode) triples.

    mode "i8":   int8 storage, value = q * scale
    mode "bf16": bf16 storage in REAL units; `scale` is the calibrated
                 quantization step a consuming conv uses to make its
                 int8 operand (requant-on-read)
    mode "f32t": fp32 in `scale`-units (the defer-requant branch)
    mode "f32":  fp32 real units, scale None (final heatmaps)

    `scales` are consumed in the same graph order _forward_calib
    recorded them. int8-store epilogues fold everything into ONE
    multiply-add per element: the requant 1/t pre-merged into the
    per-channel weight scale and bias, relu folded into the clip's
    lower bound (relu(y)/t rounded == clip(round(y/t), 0, 127), t > 0)."""
    env = {"in": (_stem_int8(images, stem_pad, in_pad), 1.0, "i8")}
    tmap, deferred = _scale_map(nodes, scales)

    def as_int8_operand(nm):
        """Conv input: int8 tensor + its scale, quantizing bf16 storage
        on the fly (the intercept path's recipe, ops/quant.py)."""
        q, s, mode = env[nm]
        if mode == "i8":
            return q, s
        assert mode == "bf16", f"conv input must be i8/bf16, got {mode}"
        xq = jnp.clip(jnp.round(q.astype(jnp.float32) * (1.0 / s)),
                      -QMAX, QMAX).astype(jnp.int8)
        return xq, s

    last = None
    for nd in nodes:
        if nd.kind == "conv":
            xq, xs = as_int8_operand(nd.inputs[0])
            wq, ws, b = qweights[nd.spec.name]
            acc = _conv_any(xq, wq, nd.spec, jnp.int32)
            if nd.quant and nd.store == "int8":
                t = tmap[nd.out]
                y = acc.astype(jnp.float32) * (ws * (xs / t)) + b * (1.0 / t)
                lo = 0.0 if nd.spec.relu else float(-QMAX)
                yq = jnp.clip(jnp.round(y), lo, QMAX).astype(jnp.int8)
                env[nd.out] = (yq, t, "i8")
            elif nd.quant:               # bf16 store, real units
                y = acc.astype(jnp.float32) * (ws * xs) + b
                if nd.spec.relu:
                    y = jax.nn.relu(y)
                env[nd.out] = (y.astype(jnp.bfloat16), tmap[nd.out], "bf16")
            elif nd.out in deferred:
                t = deferred[nd.out]
                y = acc.astype(jnp.float32) * (ws * (xs / t)) + b * (1.0 / t)
                if nd.spec.relu:
                    y = jax.nn.relu(y)
                env[nd.out] = (y, t, "f32t")
            else:                        # final fp32 conv (the heatmaps)
                y = acc.astype(jnp.float32) * (ws * xs) + b
                if nd.spec.relu:
                    y = jax.nn.relu(y)
                env[nd.out] = (y, None, "f32")
            last = env[nd.out]
        elif nd.kind == "maxpool":
            xq, xs, mode = env[nd.inputs[0]]
            pad = jnp.int8(-128) if mode == "i8" else jnp.bfloat16(-jnp.inf)
            env[nd.out] = (_maxpool(xq, pad), xs, mode)
            last = env[nd.out]
        elif nd.kind == "upsample":
            xq, xs, mode = env[nd.inputs[0]]
            thw = _upsample_target(nd, xq, env, unwrap=lambda v: v[0])
            env[nd.out] = (_upsample_nearest(xq, thw), xs, mode)
            last = env[nd.out]
        elif nd.kind == "add":
            t = tmap[nd.out] if nd.quant else None
            int8_out = nd.quant and nd.store == "int8"
            modes = [env[nm][2] for nm in nd.inputs]
            # fold per-input s/t into the dequant muls only when the
            # result is requantized AND no input is already real-units
            fold = int8_out and all(m in ("i8", "f32t") for m in modes)
            y = None
            for nm in nd.inputs:
                q, s, mode = env[nm]
                if mode == "bf16":
                    v = q.astype(jnp.float32)
                elif mode == "f32t":
                    v = q if (fold and s == t) else q * (s if not fold
                                                         else s / t)
                else:
                    v = q.astype(jnp.float32) * (s / t if fold else s)
                y = v if y is None else y + v
            if int8_out:
                if not fold:
                    y = y * (1.0 / t)
                lo = 0.0 if nd.relu else float(-QMAX)
                env[nd.out] = (jnp.clip(jnp.round(y), lo, QMAX)
                               .astype(jnp.int8), t, "i8")
            elif nd.quant:               # bf16 store
                if nd.relu:
                    y = jax.nn.relu(y)
                env[nd.out] = (y.astype(jnp.bfloat16), t, "bf16")
            else:
                if nd.relu:
                    y = jax.nn.relu(y)
                env[nd.out] = (y, None, "f32")
            last = env[nd.out]
        else:  # pragma: no cover
            raise ValueError(nd.kind)
    return last[0]


# ---------------------------------------------------------------------------
# builder
# ---------------------------------------------------------------------------

def _quantize_weights(weights):
    out = {}
    for name, (k, b) in weights.items():
        wq, ws = quantize_weight(k)      # shared recipe, ops/quant.py
        out[name] = (wq, ws / QMAX, b)
    return out


def _fold(variables, backbone: str):
    if backbone.startswith("hrnet"):
        return fold_hrnet_pose(variables, backbone)
    if backbone.startswith("resnet"):
        return fold_simple_baseline(variables, backbone)
    raise ValueError(
        f"Int8Engine supports the SimpleBaseline (resnet*) and HRNet "
        f"(hrnet*) heatmap families only, got backbone={backbone!r}")


class Int8Engine:
    """Build once from a trained SimpleBaseline/HRNetPose `variables`
    tree + representative uint8 crop batches; call with uint8 images to
    get fp32 heatmaps (NHWC). `decode()` adds the fused DARK decode.

    >>> eng = Int8Engine.build(variables, backbone="resnet50",
    ...                        calib=[crops])          # crops uint8 NHWC
    >>> hm = eng(crops)                                # (B, Hh, Wh, K) fp32
    >>> coords, scores = eng.decode(crops)             # fused decode
    """

    def __init__(self, nodes, qweights, scales, stem_pad, in_pad,
                 decode_method="dark", blur_kernel: int = 11,
                 sigma: float = 2.0, weights_as_args: bool = False):
        self._nodes = nodes
        self._qw = qweights
        self._scales = tuple(scales)
        self._pad = stem_pad
        self._in_pad = in_pad
        # weights_as_args=False BAKES the int8 weights into the program as
        # XLA constants: measured +5-6% e2e on v5e (XLA pre-packs constant
        # conv operands into the MXU layout at compile time; runtime-arg
        # weights relayout per call). The argument form remains for
        # embedding in larger programs (forward_traceable) where baking
        # would constant-fold tens of MB into every caller's executable.
        if weights_as_args:
            wc = None
        else:
            wc = jax.device_get(qweights)    # host constants -> baked

        def _fwd(w, imgs):
            return _forward_int8(nodes, w, self._scales, stem_pad, in_pad,
                                 imgs)

        def _dec(w, imgs):
            hm = _fwd(w, imgs)
            from tpupose.ops.decode import decode_heatmaps
            return decode_heatmaps(jnp.transpose(hm, (0, 3, 1, 2)),
                                   method=decode_method,
                                   blur_kernel=blur_kernel, sigma=sigma)

        if wc is None:
            self._fwd = jax.jit(_fwd)
            self._dec = jax.jit(_dec)
        else:
            # keep the (w, imgs) signature for callers; w is ignored
            self._fwd = jax.jit(lambda w, imgs, _f=_fwd: _f(wc, imgs))
            self._dec = jax.jit(lambda w, imgs, _f=_dec: _f(wc, imgs))

    @classmethod
    def build(cls, variables, backbone: str = "resnet50",
              calib: Sequence = (), decode_method: str = "dark",
              blur_kernel: int = 11, sigma: float = 2.0,
              defer_requant: bool = False,
              min_int8_channels: int = 1 << 30,
              weights_as_args: bool = False):
        nodes, weights, stem_pad, in_pad = _fold(variables, backbone)
        nodes = _assign_store(nodes, weights, min_int8_channels)
        if defer_requant:   # measured slower on current XLA; see the pass
            nodes = _defer_requant(nodes)
        if hasattr(calib, "shape"):
            calib = [calib]
        if not len(calib):
            raise ValueError("need >=1 uint8 calibration batch")
        run = jax.jit(lambda imgs: _forward_calib(nodes, weights, stem_pad,
                                                  in_pad, imgs)[1])
        amax = None
        for batch in calib:
            got = [float(v) for v in jax.device_get(run(jnp.asarray(batch)))]
            amax = got if amax is None else [max(a, g)
                                             for a, g in zip(amax, got)]
        amax = [max(a, 1e-6) for a in amax]
        return cls(nodes, _quantize_weights(weights), amax, stem_pad,
                   in_pad, decode_method, blur_kernel, sigma,
                   weights_as_args=weights_as_args)

    def __call__(self, images):
        return self._fwd(self._qw, jnp.asarray(images))

    def decode(self, images):
        return self._dec(self._qw, jnp.asarray(images))

    def forward_traceable(self, images, qweights=None):
        """The int8 forward as a traceable expression (uint8 NHWC -> fp32
        heatmaps NHWC) for embedding inside a larger jitted program —
        e.g. the evaluator's fused forward+flip+merge+decode step.

        Pass `qweights` (this engine's `_qw` pytree, threaded through the
        caller's jit as an ARGUMENT) so the quantized weights stay runtime
        buffers; closing over the default bakes every weight into the
        caller's executable as XLA constants (weights held twice in HBM +
        constant-folding over tens of MB each compile)."""
        qw = self._qw if qweights is None else qweights
        return _forward_int8(self._nodes, qw, self._scales,
                             self._pad, self._in_pad, images)


def folded_fp32_forward(variables, backbone: str = "resnet50"):
    """The BN-folded fp32 graph as a jittable fn(images_uint8) -> heatmaps.
    Exists so tests can pin folding correctness against model.apply."""
    nodes, weights, stem_pad, in_pad = _fold(variables, backbone)
    return jax.jit(lambda imgs: _forward_calib(nodes, weights, stem_pad,
                                               in_pad, jnp.asarray(imgs))[0])
