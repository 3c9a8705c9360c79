"""Round-5 decisive probes for the all-Pallas int8 engine gap
(VERDICT.md r4 task 1): WHERE do the links lose against both the plan
budget (docs/PALLAS_ENGINE_PLAN.md:18-31) and XLA's own int8 interior?

  P1  Mosaic int8 matmul rate vs bf16, engine-realistic shapes
      (M=3072, the layer1 c2 im2col matmul; M=768 stage2) — the plan's
      core premise is that in-kernel int8 doubles MXU throughput.
  P2  Requant epilogue VPU cost in isolation (mul+add+relu+round+clip+
      cast on (3072, 256) f32 per step) — the engine runs ~10 of these
      per image.
  P3  im2col scratch-ref round trip vs direct 9-shift accumulated
      matmuls (no scratch) for a 3x3 conv body.
  P4  batched bf16 selector matmul cost (the stride-2 column gather).

Run ON TPU: PYTHONPATH=/root/repo python scripts/r5_mxu_probe.py
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpupose.utils.cache import enable_compile_cache

enable_compile_cache()


from tpupose.utils.timing import median_time  # noqa: E402


def _mm_kernel(x_ref, w_ref, o_ref, *, pe):
    o_ref[0] = jax.lax.dot_general(
        x_ref[0], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=pe)


def probe_mm(G, M, K, N, dtype, pe, label):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randint(-100, 100, (G, M, K)), dtype)
    w = jnp.asarray(rs.randint(-100, 100, (K, N)), dtype)
    f = pl.pallas_call(
        partial(_mm_kernel, pe=pe),
        grid=(G,),
        in_specs=[pl.BlockSpec((1, M, K), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((K, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, M, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, M, N), pe),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )
    fj = jax.jit(lambda a, b: f(a, b))
    try:
        t = median_time(fj, x, w, n1=8, n2=64)
    except Exception as e:  # noqa: BLE001
        print(f"  {label}: FAIL {' '.join(repr(e).split())[:200]}",
              flush=True)
        return
    fl = 2.0 * G * M * K * N
    rate = fl / t / 1e12
    note = "  (!above int8 peak 394T — tunnel artifact, UNRELIABLE)" \
        if rate > 420 else ""
    print(f"  {label}: {t * 1e3:7.3f} ms  {rate:6.1f} TFLOP/s{note}",
          flush=True)


def _epi_kernel(x_ref, m_ref, b_ref, o_ref, *, reps):
    x = x_ref[...]
    m = m_ref[...]
    b = b_ref[...]
    y = x
    for _ in range(reps):
        y = jnp.clip(jnp.round(jnp.maximum(y.astype(jnp.float32) * m + b,
                                           0.0)), 0.0, 127.0
                     ).astype(jnp.int8)
    o_ref[...] = y


def probe_epilogue(G, M, N, reps):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randint(0, 127, (G, M, N)), jnp.int8)
    m = jnp.asarray(rs.uniform(0.5, 2, (1, N)), jnp.float32)
    b = jnp.asarray(rs.uniform(-1, 1, (1, N)), jnp.float32)
    f = pl.pallas_call(
        partial(_epi_kernel, reps=reps),
        grid=(G,),
        in_specs=[pl.BlockSpec((1, M, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, M, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, M, N), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )
    fj = jax.jit(lambda a, mm, bb: f(a, mm, bb))
    t = median_time(fj, x, m, b, n1=8, n2=64)
    el = G * M * N * reps
    print(f"  epilogue (G={G}, {M}x{N}, reps={reps}): {t * 1e3:7.3f} ms  "
          f"{el / t / 1e9:6.1f} Gelem/s", flush=True)


def _conv_scratch_kernel(x_ref, w_ref, o_ref, im_ref, *, H, W, C):
    rows = H * W
    h3 = x_ref[...].reshape(1, H, W, C)
    hp = jnp.pad(h3, ((0, 0), (1, 1), (1, 1), (0, 0)))
    for k, (dy, dx) in enumerate(
            (dy, dx) for dy in range(3) for dx in range(3)):
        im_ref[:rows, k * C:(k + 1) * C] = (
            hp[:, dy:dy + H, dx:dx + W, :].reshape(rows, C))
    o_ref[...] = jax.lax.dot_general(
        im_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).reshape(1, H, W, -1)


def _conv_direct_kernel(x_ref, w_ref, o_ref, *, H, W, C):
    rows = H * W
    h3 = x_ref[...].reshape(1, H, W, C)
    hp = jnp.pad(h3, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for k, (dy, dx) in enumerate(
            (dy, dx) for dy in range(3) for dx in range(3)):
        sl = hp[:, dy:dy + H, dx:dx + W, :].reshape(rows, C)
        p = jax.lax.dot_general(
            sl, w_ref[k], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = p if acc is None else acc + p
    o_ref[...] = acc.reshape(1, H, W, -1)


def probe_conv3(G, H, W, C, O):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randint(-100, 100, (G, H, W, C)), jnp.int8)
    wflat = jnp.asarray(rs.randint(-100, 100, (9 * C, O)), jnp.int8)
    w9 = jnp.asarray(np.asarray(wflat).reshape(9, C, O))
    fl = 2.0 * G * H * W * 9 * C * O

    f1 = pl.pallas_call(
        partial(_conv_scratch_kernel, H=H, W=W, C=C),
        grid=(G,),
        in_specs=[pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((9 * C, O), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W, O), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, H, W, O), jnp.int32),
        scratch_shapes=[pltpu.VMEM((H * W, 9 * C), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )
    t = median_time(jax.jit(lambda a, b: f1(a, b)), x, wflat, n1=8, n2=64)
    print(f"  conv3x3 scratch-im2col ({H}x{W}x{C}->{O}): {t * 1e3:7.3f} ms"
          f"  {fl / t / 1e12:6.1f} TFLOP/s", flush=True)

    f2 = pl.pallas_call(
        partial(_conv_direct_kernel, H=H, W=W, C=C),
        grid=(G,),
        in_specs=[pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((9, C, O), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W, O), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, H, W, O), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )
    try:
        t = median_time(jax.jit(lambda a, b: f2(a, b)), x, w9, n1=8, n2=64)
        print(f"  conv3x3 direct-9-matmul ({H}x{W}x{C}->{O}): "
              f"{t * 1e3:7.3f} ms  {fl / t / 1e12:6.1f} TFLOP/s",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"  conv3x3 direct: FAIL {' '.join(repr(e).split())[:200]}",
              flush=True)




def probe_selector(G, R, W, C):
    """sel (R, W/2, W) @ rows (R, W, C) batched — the stride-2 column
    gather of pallas_stages (R = g*ho rows per step)."""
    rs = np.random.RandomState(0)
    sel = np.zeros((R, W // 2, W), np.float64)
    sel[:, np.arange(W // 2), 2 * np.arange(W // 2)] = 1.0
    s0 = jnp.asarray(sel, jnp.bfloat16)
    x = jnp.asarray(rs.randint(-100, 100, (G, R, W, C)), jnp.int8)

    def k2(s_ref, x_ref, o_ref):
        r = jax.lax.dot_general(
            s_ref[...], x_ref[0].astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[0] = r.astype(jnp.int8)
    f = pl.pallas_call(
        k2,
        grid=(G,),
        in_specs=[pl.BlockSpec((R, W // 2, W), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, R, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, W // 2, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, R, W // 2, C), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )
    try:
        t = median_time(jax.jit(lambda a, b: f(a, b)), s0, x, n1=8, n2=64)
        print(f"  selector (R={R}, W={W}, C={C}): {t * 1e3:7.3f} ms",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"  selector: FAIL {' '.join(repr(e).split())[:200]}",
              flush=True)


def _fused_kernel(x_ref, w_ref, m_ref, b_ref, o_ref, *, mode):
    """matmul then requant epilogue — measures MXU/VPU overlap: if
    t(fused) ~= t(mm) + t(epi) the units serialize; ~= max() they
    overlap."""
    acc = jax.lax.dot_general(
        x_ref[0], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    if mode == "full":
        y = jnp.clip(jnp.round(jnp.maximum(
            acc.astype(jnp.float32) * m_ref[...] + b_ref[...], 0.0)),
            0.0, 127.0).astype(jnp.int8)
    elif mode == "cheap":     # relu + truncate-cast + min-clip only
        y = jnp.minimum(jnp.maximum(
            acc.astype(jnp.float32) * m_ref[...], 0.0), 127.0
            ).astype(jnp.int8)
    else:                     # none: raw int32 -> int8 cast
        y = acc.astype(jnp.int8)
    o_ref[0] = y


def probe_fused(G, M, K, N, mode):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randint(-100, 100, (G, M, K)), jnp.int8)
    w = jnp.asarray(rs.randint(-100, 100, (K, N)), jnp.int8)
    m = jnp.asarray(rs.uniform(1e-4, 1e-3, (1, N)), jnp.float32)
    b = jnp.asarray(rs.uniform(-1, 1, (1, N)), jnp.float32)
    f = pl.pallas_call(
        partial(_fused_kernel, mode=mode),
        grid=(G,),
        in_specs=[pl.BlockSpec((1, M, K), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((K, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, M, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, M, N), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )
    fj = jax.jit(lambda a, ww, mm, bb: f(a, ww, mm, bb))
    try:
        t = median_time(fj, x, w, m, b, n1=8, n2=64)
        fl = 2.0 * G * M * K * N
        print(f"  mm+epi[{mode}] M={M} K={K} N={N} x{G}: {t * 1e3:7.3f} ms"
              f"  {fl / t / 1e12:6.1f} TFLOP/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"  mm+epi[{mode}]: FAIL {' '.join(repr(e).split())[:200]}",
              flush=True)


def _epi2_kernel(x_ref, m_ref, b_ref, o_ref, *, reps, mode):
    y = x_ref[...]
    m = m_ref[...]
    b = b_ref[...]
    for _ in range(reps):
        if mode == "cheap":
            y = jnp.minimum(jnp.maximum(
                y.astype(jnp.float32) * m, 0.0), 127.0).astype(jnp.int8)
        elif mode == "int":
            # integer requant: (acc * mul) >> 16, int32 path end-to-end
            y = jnp.right_shift(
                y.astype(jnp.int32) * 19001, 16).astype(jnp.int8)
        else:
            y = jnp.clip(jnp.round(jnp.maximum(
                y.astype(jnp.float32) * m + b, 0.0)), 0.0, 127.0
                ).astype(jnp.int8)
    o_ref[...] = y


def probe_epi2(G, M, N, reps, mode):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randint(0, 127, (G, M, N)), jnp.int8)
    m = jnp.asarray(rs.uniform(0.5, 2, (1, N)), jnp.float32)
    b = jnp.asarray(rs.uniform(-1, 1, (1, N)), jnp.float32)
    f = pl.pallas_call(
        partial(_epi2_kernel, reps=reps, mode=mode),
        grid=(G,),
        in_specs=[pl.BlockSpec((1, M, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, M, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, M, N), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )
    fj = jax.jit(lambda a, mm, bb: f(a, mm, bb))
    try:
        t = median_time(fj, x, m, b, n1=8, n2=64)
        el = G * M * N * reps
        print(f"  epilogue[{mode}] ({M}x{N} x{G}, reps={reps}): "
              f"{t * 1e3:7.3f} ms  {el / t / 1e9:6.1f} Gelem/s",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"  epilogue[{mode}]: FAIL "
              f"{' '.join(repr(e).split())[:200]}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)

    print("P1: MXU rate (grid-resident weight, per-step matmul)",
          flush=True)
    # layer1 c2 shape: 128 steps of (3072, 1152) @ (1152, 128)
    probe_mm(128, 3072, 1152, 128, jnp.int8, jnp.int32,
             "int8  M=3072 K=1152 N=128 x128")
    probe_mm(128, 3072, 1152, 128, jnp.bfloat16, jnp.float32,
             "bf16  M=3072 K=1152 N=128 x128")
    # c0-like: K=128 N=128
    probe_mm(128, 3072, 128, 128, jnp.int8, jnp.int32,
             "int8  M=3072 K=128  N=128 x128")
    probe_mm(128, 3072, 128, 128, jnp.bfloat16, jnp.float32,
             "bf16  M=3072 K=128  N=128 x128")
    # stage3-like: M=768 (g=4), K=2304, N=256
    probe_mm(32, 768, 2304, 256, jnp.int8, jnp.int32,
             "int8  M=768  K=2304 N=256 x32")
    probe_mm(32, 768, 2304, 256, jnp.bfloat16, jnp.float32,
             "bf16  M=768  K=2304 N=256 x32")
    # wide-N: does N=512 help int8?
    probe_mm(32, 768, 1152, 512, jnp.int8, jnp.int32,
             "int8  M=768  K=1152 N=512 x32")
    probe_mm(32, 768, 1152, 512, jnp.bfloat16, jnp.float32,
             "bf16  M=768  K=1152 N=512 x32")

    print("P2: requant epilogue VPU rate", flush=True)
    probe_epilogue(128, 3072, 128, 4)
    probe_epilogue(128, 3072, 256, 4)

    print("P3: im2col scratch vs direct 9-matmul conv body", flush=True)
    probe_conv3(128, 64, 48, 128, 128)
    probe_conv3(32, 16, 12, 256, 256)

    print("P4: selector matmul", flush=True)
    probe_selector(64, 2 * 32, 48, 128)

    print("P5: MXU/VPU overlap (mm vs mm+epilogue, layer1 c2 shape)",
          flush=True)
    probe_fused(128, 3072, 1152, 128, "none")
    probe_fused(128, 3072, 1152, 128, "cheap")
    probe_fused(128, 3072, 1152, 128, "full")

    print("P6: cheaper epilogue variants", flush=True)
    probe_epi2(128, 3072, 256, 4, "full")
    probe_epi2(128, 3072, 256, 4, "cheap")
    probe_epi2(128, 3072, 256, 4, "int")

    print("P7: full bottleneck body, f32 vs integer requant (layer1 "
          "shape)", flush=True)
    probe_block(128, 64, 48, 128, 256, "f32")
    probe_block(128, 64, 48, 128, 256, "int")




def _block_kernel(x_ref, w1_ref, w2_ref, w3_ref, m1r, b1r, m2r, b2r,
                  m3r, b3r, o_ref, im_ref, *, H, W, C, CO, mode):
    """One bottleneck body at layer1 shape: c0 (1x1) -> requant -> c2
    (3x3 via scratch im2col) -> requant -> c3 (1x1, CO) -> residual add
    -> requant. Epilogues in f32 (the engine's current scheme) or int32
    fixed-point (the 6x-faster P6 lever) — timing-only probe that
    upgrades the verdict's 'integer requant still would not flip it'
    from arithmetic to measurement."""
    rows = H * W
    m1, b1, m2, b2, m3, b3 = (m1r[...], b1r[...], m2r[...], b2r[...],
                              m3r[...], b3r[...])

    def rq_f32(acc, m, b):
        return jnp.clip(jnp.round(jnp.maximum(
            acc.astype(jnp.float32) * m + b, 0.0)), 0.0, 127.0
            ).astype(jnp.int8)

    def rq_int(acc, m, b):
        # (acc >> 6) * m16, + b, >> 12, relu, clamp — TFLite-style
        # fixed-point; numerics representative, not calibrated
        v = jnp.right_shift(acc, 6) * m.astype(jnp.int32) \
            + b.astype(jnp.int32)
        v = jnp.right_shift(v, 12)
        return jnp.minimum(jnp.maximum(v, 0), 127).astype(jnp.int8)

    rq = rq_f32 if mode == "f32" else rq_int
    x = x_ref[...].reshape(rows, C)
    h0 = rq(jax.lax.dot_general(x, w1_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32), m1, b1)
    h3 = h0.reshape(1, H, W, C)
    hp = jnp.pad(h3, ((0, 0), (1, 1), (1, 1), (0, 0)))
    for k, (dy, dx) in enumerate(
            (dy, dx) for dy in range(3) for dx in range(3)):
        im_ref[:rows, k * C:(k + 1) * C] = (
            hp[:, dy:dy + H, dx:dx + W, :].reshape(rows, C))
    h1 = rq(jax.lax.dot_general(im_ref[...], w2_ref[...],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32), m2, b2)
    y = jax.lax.dot_general(h1, w3_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    res = y + jnp.pad(x, ((0, 0), (0, CO - C))).astype(jnp.int32) * 17
    o_ref[...] = rq(res, m3, b3).reshape(1, H, W, CO)


def probe_block(G, H, W, C, CO, mode):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randint(-100, 100, (G, H, W, C)), jnp.int8)
    w1 = jnp.asarray(rs.randint(-100, 100, (C, C)), jnp.int8)
    w2 = jnp.asarray(rs.randint(-100, 100, (9 * C, C)), jnp.int8)
    w3 = jnp.asarray(rs.randint(-100, 100, (C, CO)), jnp.int8)
    if mode == "f32":
        ms = [jnp.asarray(rs.uniform(1e-4, 1e-3, (1, n)), jnp.float32)
              if i % 2 == 0 else
              jnp.asarray(rs.uniform(-1, 1, (1, n)), jnp.float32)
              for i, n in enumerate((C, C, C, C, CO, CO))]
    else:
        ms = [jnp.asarray(rs.randint(1, 4096, (1, n)), jnp.int16)
              for n in (C, C, C, C, CO, CO)]
    f = pl.pallas_call(
        partial(_block_kernel, H=H, W=W, C=C, CO=CO, mode=mode),
        grid=(G,),
        in_specs=[pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd,
                        memory_space=pltpu.VMEM)
           for a in (w1, w2, w3, *ms)],
        out_specs=pl.BlockSpec((1, H, W, CO), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, H, W, CO), jnp.int8),
        scratch_shapes=[pltpu.VMEM((H * W, 9 * C), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )
    fj = jax.jit(lambda a, *rest: f(a, *rest))
    try:
        t = median_time(fj, x, w1, w2, w3, *ms, n1=8, n2=32)
        print(f"  block[{mode}] ({H}x{W}x{C}->{CO}) x{G}: "
              f"{t * 1e3:7.3f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"  block[{mode}]: FAIL {' '.join(repr(e).split())[:300]}",
              flush=True)


if __name__ == "__main__":
    main()
