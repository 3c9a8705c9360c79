"""Round-4 Mosaic probes for the ALL-Pallas int8 serving engine
(BASELINE.md round-4 conclusion: the only remaining route to the 5x
target is an input->heatmaps Pallas chain with zero XLA convs, int8
matmuls in-kernel). Each probe answers one capability question the
design depends on:

  R1  f32 -> int8 requant cast in-kernel (clip + round + astype) —
      needed to CHAIN int8 matmuls (requantize between layers)
  R2  int8 matmul -> scale -> relu -> requant -> second int8 matmul
      (the full two-layer int8 pipeline in one kernel)
  R3  leading(untiled)-dim unit-index writes interleaving deconv
      row phases: out_ref[2i+p] = row  (the head's H-interleave)
  R4  leading-dim strided write out_ref[p::2] (cheaper form of R3)
  R5  batched selector matmul W-interleave (2W,W)@(H,W,C) (the
      head's column interleave, bridge-kernel _col_select transposed)

Run ON TPU: python scripts/r4_probe_engine.py
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpupose.utils.cache import enable_compile_cache

enable_compile_cache()


def run(name, fn):
    try:
        t0 = time.time()
        r = fn()
        dt = time.time() - t0
        print(f"PROBE {name}: OK {r} ({dt:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001 - probe must survive anything
        msg = " ".join(repr(e).split())[:300]
        print(f"PROBE {name}: FAIL {msg}", flush=True)


def probe_R1():
    def k(x_ref, o_ref):
        v = x_ref[...]
        q = jnp.clip(jnp.round(v * 0.25), -127, 127).astype(jnp.int8)
        o_ref[...] = q

    x = jnp.asarray(np.random.RandomState(0)
                    .uniform(-600, 600, (8, 256)).astype(np.float32))
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int8))(x)
    ref = np.clip(np.round(np.asarray(x) * 0.25), -127, 127).astype(np.int8)
    return {"max_err": int(np.abs(np.asarray(out).astype(np.int32)
                                  - ref.astype(np.int32)).max())}


def probe_R2():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randint(-127, 128, (256, 512)).astype(np.int8))
    w1 = jnp.asarray(rs.randint(-127, 128, (512, 256)).astype(np.int8))
    w2 = jnp.asarray(rs.randint(-127, 128, (256, 128)).astype(np.int8))

    def k(x_ref, w1_ref, w2_ref, o_ref):
        a = jnp.dot(x_ref[...], w1_ref[...],
                    preferred_element_type=jnp.int32)
        h = jax.nn.relu(a.astype(jnp.float32) * 0.001)
        hq = jnp.clip(jnp.round(h * 8.0), -127, 127).astype(jnp.int8)
        b = jnp.dot(hq, w2_ref[...], preferred_element_type=jnp.int32)
        o_ref[...] = b

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32))(x, w1, w2)
    a = np.asarray(x, np.int32) @ np.asarray(w1, np.int32)
    h = np.maximum(a.astype(np.float32) * 0.001, 0.0)
    hq = np.clip(np.round(h * 8.0), -127, 127).astype(np.int32)
    ref = hq @ np.asarray(w2, np.int32)
    return {"max_err": int(np.abs(np.asarray(out) - ref).max())}


def probe_R3():
    def k(x_ref, o_ref):
        for i in range(8):
            o_ref[2 * i] = x_ref[i] * 2.0
            o_ref[2 * i + 1] = x_ref[i] * 3.0

    x = jnp.asarray(np.random.RandomState(2)
                    .rand(8, 16, 256).astype(np.float32))
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((16, 16, 256), jnp.float32))(x)
    xn = np.asarray(x)
    ref = np.zeros((16, 16, 256), np.float32)
    ref[0::2] = xn * 2.0
    ref[1::2] = xn * 3.0
    return {"max_err": float(np.abs(np.asarray(out) - ref).max())}


def probe_R4():
    def k(x_ref, o_ref):
        o_ref[0::2] = x_ref[...] * 2.0
        o_ref[1::2] = x_ref[...] * 3.0

    x = jnp.asarray(np.random.RandomState(3)
                    .rand(8, 16, 256).astype(np.float32))
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((16, 16, 256), jnp.float32))(x)
    xn = np.asarray(x)
    ref = np.zeros((16, 16, 256), np.float32)
    ref[0::2] = xn * 2.0
    ref[1::2] = xn * 3.0
    return {"max_err": float(np.abs(np.asarray(out) - ref).max())}


def probe_R5():
    H, W, C = 16, 12, 256
    sel = np.zeros((2, H, 2 * W, W), np.float32)
    sel[0, :, 2 * np.arange(W), np.arange(W)] = 1.0
    sel[1, :, 2 * np.arange(W) + 1, np.arange(W)] = 1.0
    s0 = jnp.asarray(sel[0], jnp.bfloat16)
    s1 = jnp.asarray(sel[1], jnp.bfloat16)

    def k(a_ref, b_ref, s0_ref, s1_ref, o_ref):
        def colsel(s, rows):
            return jax.lax.dot_general(
                s, rows, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        o = colsel(s0_ref[...], a_ref[...]) + colsel(s1_ref[...], b_ref[...])
        o_ref[...] = o.astype(jnp.bfloat16)

    rs = np.random.RandomState(4)
    a = jnp.asarray(rs.rand(H, W, C).astype(np.float32), jnp.bfloat16)
    b = jnp.asarray(rs.rand(H, W, C).astype(np.float32), jnp.bfloat16)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((H, 2 * W, C), jnp.bfloat16)
    )(a, b, s0, s1)
    ref = np.zeros((H, 2 * W, C), np.float32)
    ref[:, 0::2] = np.asarray(a, np.float32)
    ref[:, 1::2] = np.asarray(b, np.float32)
    return {"max_err": float(np.abs(np.asarray(out, np.float32) - ref).max())}


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    run("R1_f32_to_int8_requant", probe_R1)
    run("R2_chained_int8_matmul", probe_R2)
    run("R3_leaddim_unit_writes", probe_R3)
    run("R4_leaddim_strided_write", probe_R4)
    run("R5_selector_col_interleave", probe_R5)
