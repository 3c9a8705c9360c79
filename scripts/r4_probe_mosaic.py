"""Round-4 Mosaic capability probes for the fused-stem kernel design.

The round-3 ceiling analysis (BASELINE.md) left ONE untried route to the
5x target: a Pallas stem(+maxpool) kernel that consumes the uint8 input
directly so XLA never emits the batch-in-lanes stem layout. Several
kernel formulations are possible; which one is buildable depends on what
THIS toolchain's Mosaic supports. Each probe below answers one question:

  A  value reshape that SPLITS the lane dim   (768 -> (96, 8))
  A2 lane split at half-tile granularity      (6144 -> (96, 64))
  B* sub-slice STORES at lane offsets of 8/12/16/48 (the layer1 kernel
     already proves offset-64 works)
  C  jnp.concatenate of narrow pieces along lanes (round-3: failed at
     9x64; re-probe at 4x12)
  D  strided sublane reads v[:, 0::2, :] (would make s2d unnecessary)
  E  uint8 operand + in-kernel convert
  G  reduced-shape batch-in-lanes einsum "hwcb,co->hwob" (round-3
     blocker re-probe, VERDICT.md task 8)
  F  XLA-side cost of the parity-split s2d prep that feeds the kernel
     (no strided slices: pad + reshape + unit slices + concat)

Run ON TPU: python scripts/r4_probe_mosaic.py
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
        msg = " ".join(repr(e).split())[:400]
        print(f"PROBE {name}: FAIL {msg}", flush=True)


def probe_A():
    def k(x_ref, o_ref):
        v = x_ref[...].reshape(8, 96, 8)
        o_ref[...] = v.sum(axis=-1)

    x = (jnp.arange(8 * 768, dtype=jnp.float32)
         .reshape(8, 768) % 61).astype(jnp.bfloat16)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 96), jnp.bfloat16))(x)
    ref = np.asarray(x, np.float32).reshape(8, 96, 8).sum(-1)
    return {"max_err": float(np.abs(np.asarray(out, np.float32) - ref).max())}


def probe_A2():
    def k(x_ref, o_ref):
        v = x_ref[...].reshape(8, 96, 64)
        o_ref[...] = v.sum(axis=-1)

    x = (jnp.arange(8 * 6144, dtype=jnp.float32)
         .reshape(8, 6144) % 61).astype(jnp.bfloat16)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 96), jnp.bfloat16))(x)
    ref = np.asarray(x, np.float32).reshape(8, 96, 64).sum(-1)
    return {"max_err": float(np.abs(np.asarray(out, np.float32) - ref).max())}


def _probe_store(w):
    def fn():
        def k(x_ref, o_ref):
            for i in range(4):
                o_ref[:, i * w:(i + 1) * w] = x_ref[...] * (i + 1.0)

        x = (jnp.arange(8 * w, dtype=jnp.float32)
             .reshape(8, w) % 17).astype(jnp.bfloat16)
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 4 * w), jnp.bfloat16))(x)
        ref = np.concatenate(
            [np.asarray(x, np.float32) * (i + 1) for i in range(4)], -1)
        return {"max_err":
                float(np.abs(np.asarray(out, np.float32) - ref).max())}
    return fn


def probe_C():
    def k(x_ref, o_ref):
        v = x_ref[...]
        pieces = [v[:, n:n + 96, :] for n in range(4)]
        o_ref[...] = jnp.concatenate(pieces, axis=-1)

    x = (jnp.arange(8 * 100 * 12, dtype=jnp.float32)
         .reshape(8, 100, 12) % 23).astype(jnp.bfloat16)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 96, 48), jnp.bfloat16))(x)
    xr = np.asarray(x, np.float32)
    ref = np.concatenate([xr[:, n:n + 96, :] for n in range(4)], -1)
    return {"max_err": float(np.abs(np.asarray(out, np.float32) - ref).max())}


def probe_D():
    def k(x_ref, o_ref):
        v = x_ref[...]
        o_ref[...] = v[:, 0::2, :]

    x = (jnp.arange(8 * 96 * 128, dtype=jnp.float32)
         .reshape(8, 96, 128) % 31).astype(jnp.bfloat16)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 48, 128), jnp.bfloat16))(x)
    ref = np.asarray(x, np.float32)[:, 0::2, :]
    return {"max_err": float(np.abs(np.asarray(out, np.float32) - ref).max())}


def probe_E():
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...].astype(jnp.bfloat16) * 2.0

    x = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (8, 256), np.uint8))
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.bfloat16))(x)
    ref = np.asarray(x, np.float32) * 2.0
    return {"max_err": float(np.abs(np.asarray(out, np.float32) - ref).max())}


def probe_G():
    """Reduced-shape re-probe of the round-3 batch-in-lanes blocker."""
    H, W, C, B, O = 2, 48, 64, 128, 64

    def k(x_ref, w_ref, o_ref):
        o_ref[...] = jnp.einsum(
            "hwcb,co->hwob", x_ref[...], w_ref[...],
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    x = (jnp.arange(H * W * C * B, dtype=jnp.float32)
         .reshape(H, W, C, B) % 13 / 13.).astype(jnp.bfloat16)
    w = (jnp.arange(C * O, dtype=jnp.float32)
         .reshape(C, O) % 7 / 7.).astype(jnp.bfloat16)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((H, W, O, B), jnp.bfloat16))(x, w)
    ref = np.einsum("hwcb,co->hwob", np.asarray(x, np.float32),
                    np.asarray(w, np.float32))
    return {"max_err":
            float(np.abs(np.asarray(out, np.float32) - ref).max() /
                  max(np.abs(ref).max(), 1))}


def probe_F():
    """XLA-side parity-split s2d prep cost at serving shape: uint8
    (B,256,192,3) -> bf16 Q' (B,128,96,64) with
    Q'[i,j,(q,ky,c)] = x[2i+ky-3, 2j+q, c], ky in 0..7 (rows zero-pad).
    Only pad/reshape/unit-slice/concat — no strided slices, no gather."""
    B = 128

    @jax.jit
    def prep(x):
        xb = x.astype(jnp.bfloat16)
        xb = xb.reshape(B, 256, 96, 6)                    # (2j+q, c) packed
        xp = jnp.pad(xb, ((0, 0), (3, 5), (0, 0), (0, 0)))  # rows -3..260
        e = xp[:, 0::1].reshape(B, 132, 2, 96, 6)[:, :, 0]  # rows 2a
        o = xp.reshape(B, 132, 2, 96, 6)[:, :, 1]           # rows 2a+1
        taps = []
        for ky in range(8):
            m, p = divmod(ky, 2)
            src = e if p == 0 else o
            taps.append(src[:, m:m + 128])                # rows 2i+ky-3
        q = jnp.concatenate(taps, axis=-1)                # (B,128,96,48)
        return jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, 16)))

    x = jnp.asarray(np.random.RandomState(0)
                    .randint(0, 256, (B, 256, 192, 3), np.uint8))
    r = prep(x)
    r.block_until_ready()
    # correctness spot check
    xr = np.asarray(x, np.float32)
    rr = np.asarray(r, np.float32)
    i, j = 5, 7
    want = xr[0, 2 * i + 3 - 3, 2 * j + 0, 1]   # ky=3 -> lane (q=0,ky=3,c=1)
    got = rr[0, i, j, 0 * 24 + 0 + 3 * 3 + 1]   # layout (q,ky,c)? check below
    # actual lane order from the construction: concat over ky of (q,c)=6
    got = rr[0, i, j, 3 * 6 + 0 * 3 + 1]
    def run_n(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = prep(x)
        np.asarray(out[0, 0, 0, :1])
        return time.perf_counter() - t0

    run_n(2)
    t1, t2 = run_n(4), run_n(12)
    ms = (t2 - t1) / 8 * 1000
    return {"ms_per_b128": round(ms, 3), "spot_err": float(abs(want - got))}


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    run("A_lane_split_768_to_96x8", probe_A)
    run("A2_lane_split_6144_to_96x64", probe_A2)
    run("B8_store_off8", _probe_store(8))
    run("B12_store_off12", _probe_store(12))
    run("B16_store_off16", _probe_store(16))
    run("B48_store_off48", _probe_store(48))
    run("C_concat_4x12", probe_C)
    run("D_strided_sublane_read", probe_D)
    run("E_uint8_operand", probe_E)
    run("G_batch_in_lanes_einsum", probe_G)
    run("F_xla_s2d_prep_cost", probe_F)
    print("ALL PROBES DONE", flush=True)
