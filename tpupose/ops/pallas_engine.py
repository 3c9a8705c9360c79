"""The ALL-Pallas int8 R50 serving engine: uint8 crops -> f32 heatmaps
with ZERO XLA convolutions.

Why this exists (BASELINE.md, round-4 ceiling analysis): XLA prefers
exotic layouts ({0,3,2,1} / {3,0,2,1}) for every conv touching a
small-spatial tensor and charges ~1 GB/batch of relayout copies at every
custom-call shore, wherever it sits — so every PARTIAL Pallas island
measured net-negative. The two consistent configurations are all-XLA
(the ~14.2k img/s int8 champion) and THIS: an unbroken chain of Pallas
kernels from the network input to the heatmaps, where no XLA conv ever
exists to demand an exotic layout, and the MXU runs int8.

The chain (each link a pallas_call; boundaries are standard-layout
tensors, measured relayout-free between custom calls):

  center_raw + stem_s2d  (XLA: elementwise + pure permutation, no conv)
  -> stem+maxpool kernel (ops/pallas_stem.py, bf16; normalize folded)
  -> quantize            (XLA elementwise, s_stem from calibration)
  -> stages 1-4          (ops/pallas_stages.py, int8 bottleneck chunks)
  -> deconv head + final (ops/pallas_head.py, int8 phases, f32 heatmaps)

Quantization shares the int8 XLA engine's story end-to-end: the SAME
folded graph (ops/int8_engine.fold_simple_baseline) and the SAME f32
calibration forward (_forward_calib) produce per-tensor activation
scales; weights are per-output-channel symmetric int8.

Reference counterpart: none — /root/reference/HPE runs stock torch
convs; this is TPU-specific speed-of-light work on the graded config
(BASELINE.json:2, the >=5x serving-throughput line).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpupose.ops.int8_engine import _forward_calib, fold_simple_baseline
from tpupose.ops.pallas_head import DeconvSpec, build_deconv_spec, run_deconv
from tpupose.ops.pallas_stages import (QMAX, ChunkSpec, build_stage_chunks,
                                       run_chunk)
from tpupose.ops.pallas_stem import (center_raw, fold_stem_weights,
                                     stem_pool_pallas, stem_s2d)
from tpupose.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD

# R50 stage table: (block ids, hin, win, cin(padded), cmid(padded), stride)
_R50_STAGES = (
    (tuple(range(0, 3)), 64, 48, 128, 128, 1),
    (tuple(range(3, 7)), 64, 48, 256, 128, 2),
    (tuple(range(7, 13)), 32, 24, 512, 256, 2),
    (tuple(range(13, 16)), 16, 12, 1024, 512, 2),
)


@dataclass
class PallasServingEngine:
    """Built once from flax variables; __call__ maps uint8 NHWC crops
    (B, 256, 192, 3) to f32 heatmaps (B, 64, 48, K)."""

    stem_w: Dict[str, jnp.ndarray]
    s_stem: float
    chunks: List[ChunkSpec]
    deconvs: List[DeconvSpec]
    num_joints: int
    chunk_groups: List[int] = None
    dec_groups: List[int] = None
    stem_group: int = 1
    interpret: Optional[bool] = None

    @staticmethod
    def _pick_group(rows: int, cap: int = 8, target: int = 1536) -> int:
        """Images per grid step: small-spatial stages batch images into
        the matmul M-dim (one 8x6 image is 48 rows — the MXU idles);
        capped to bound VMEM and the known Mosaic large-M compile wall
        (BASELINE.md round-4: g>=2 at M=6144 crashed the bf16 layer1)."""
        g = 1
        while g * 2 <= cap and rows * g * 2 <= target:
            g *= 2
        return g

    @staticmethod
    def _chunk_group(ch, cap: int = 8, target: int = 1536,
                     vmem_limit: int = 12 * 2 ** 20) -> int:
        """Largest g whose explicit VMEM footprint (weights + im/hs
        scratch + in/out blocks) fits the 16 MB scoped-vmem budget with
        ~4 MB headroom for Mosaic value temporaries (measured OOM:
        the g=8 layer3 chunk wanted 19.6 M of the 16 M limit)."""
        wbytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                     for a in ch.args)
        g = PallasServingEngine._pick_group(ch.hout * ch.wout, cap,
                                            target)
        while g > 1:
            per_g = (ch.hout * ch.wout * (ch.im_width + ch.hs_width
                                          + ch.cout)
                     + ch.hin * ch.win * ch.cin)
            if wbytes + g * per_g <= vmem_limit:
                break
            g //= 2
        return g

    @classmethod
    def build(cls, variables, calib: Sequence = (), group: int = 0,
              stem_group: int = 1, max_weight_bytes: int = 6 * 2 ** 20,
              interpret: Optional[bool] = None):
        if hasattr(calib, "shape"):
            calib = [calib]
        if not len(calib):
            # same contract as Int8Engine.build (ADVICE.md r4): silent
            # random-noise calibration would produce arbitrary scales.
            # Checked before the (expensive) graph fold.
            raise ValueError("need >=1 uint8 calibration batch")
        nodes, weights, stem_pad, in_pad = fold_simple_baseline(variables)
        run = jax.jit(lambda imgs: _forward_calib(
            nodes, weights, stem_pad, in_pad, imgs)[1])
        amax = None
        for batch in calib:
            got = [float(v) for v in jax.device_get(run(jnp.asarray(batch)))]
            amax = got if amax is None else [
                max(a, g) for a, g in zip(amax, got)]
        amax = [max(a, 1e-6) for a in amax]

        conv_scale: Dict[str, float] = {}
        add_scales: Dict[int, float] = {}
        it = iter(amax)
        block_no = 0
        for nd in nodes:
            if nd.quant and nd.kind in ("conv", "add"):
                a = next(it, None)
                if a is None:
                    raise AssertionError(
                        "calibration amax list exhausted early: "
                        "_forward_calib's recording rule drifted from "
                        "this walk")
                s = a / QMAX
                if nd.kind == "conv":
                    conv_scale[nd.spec.name] = s
                else:
                    add_scales[block_no] = s
                    block_no += 1
        # the walk above mirrors _forward_calib's amax-recording rule;
        # if that rule ever drifts, every scale here would silently
        # misassign — assert the iterator is exactly consumed in BOTH
        # directions (ADVICE r4 + round-5 review)
        leftover = sum(1 for _ in it)
        if leftover:
            raise AssertionError(
                f"calibration amax list has {leftover} unconsumed entries: "
                "_forward_calib's recording rule drifted from this walk")

        np_w = {k: (np.asarray(v[0], np.float64), np.asarray(v[1],
                                                             np.float64))
                for k, v in weights.items()}

        chunks: List[ChunkSpec] = []
        chunk_groups: List[int] = []
        s = conv_scale["stem"]
        for blocks, hin, win, cin, cmid, stride in _R50_STAGES:
            cs, s = build_stage_chunks(
                np_w, conv_scale, add_scales, blocks, s, hin, win, cin,
                cmid, stride, g=1, max_weight_bytes=max_weight_bytes)
            chunks.extend(cs)
            chunk_groups.extend(
                [group or cls._chunk_group(c) for c in cs])

        deconvs: List[DeconvSpec] = []
        dec_groups: List[int] = []
        n_dec = sum(1 for k in np_w if k.startswith("deconv"))
        hw = 16 * 12 // 4       # deconv0 input spatial (8 * 6)
        for i in range(n_dec):
            k, b = np_w[f"deconv{i}"]
            s_out = conv_scale[f"deconv{i}"]
            final = None
            if i == n_dec - 1:
                kf, bf = np_w["final"]
                final = (kf, bf, s_out)
            d = build_deconv_spec(k, b, s, s_out, final=final)
            wbytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                         for a in d.args)
            cin = int(np.asarray(k).shape[2])
            g = group or cls._pick_group(hw)
            while g > 1:
                per_g = hw * 4 * cin + 4 * hw * (
                    d.cout * (2 if d.final_cout else 1)
                    + 4 * d.final_cout)
                if wbytes + g * per_g <= 12 * 2 ** 20:
                    break
                g //= 2
            deconvs.append(d)
            dec_groups.append(g)
            s = s_out
            hw *= 4

        kf = np.asarray(weights["final"][0])
        num_joints = int(kf.shape[-1])
        stem_w = fold_stem_weights(
            variables,
            input_scale=[1.0 / (255.0 * sd) for sd in IMAGENET_STD])
        return cls(stem_w, conv_scale["stem"], chunks, deconvs,
                   num_joints, chunk_groups=chunk_groups,
                   dec_groups=dec_groups, stem_group=stem_group,
                   interpret=interpret)

    def forward(self, images):
        """uint8 (B, 256, 192, 3) -> f32 heatmaps (B, 64, 48, K).
        Jit-traceable; every conv is a Pallas custom call."""
        x = center_raw(images).astype(jnp.bfloat16)
        x4 = stem_s2d(x)
        f = stem_pool_pallas(x4, self.stem_w, group=self.stem_group,
                             interpret=self.interpret)
        xi8 = jnp.clip(jnp.round(f.astype(jnp.float32) / self.s_stem),
                       0.0, QMAX).astype(jnp.int8)
        for ch, g in zip(self.chunks, self.chunk_groups):
            xi8 = run_chunk(xi8, ch, g=g, interpret=self.interpret)
        y = xi8
        for d, g in zip(self.deconvs, self.dec_groups):
            y = run_deconv(y, d, g=g, interpret=self.interpret)
        return y[..., :self.num_joints]

    def __call__(self, images):
        return self.forward(images)
