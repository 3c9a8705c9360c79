"""Round-4 probe set 2: cost of the 4x4 space-to-depth prep (the one
input restructuring the fused-stem kernel design needs from XLA) and
int8 casts in-kernel (would let the prep emit 1-byte lanes).

Run ON TPU: python scripts/r4_probe2.py  (from /root/repo)
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from tpupose.utils.cache import enable_compile_cache

enable_compile_cache()


def run(name, fn):
    try:
        t0 = time.time()
        r = fn()
        dt = time.time() - t0
        print(f"PROBE {name}: OK {r} ({dt:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = " ".join(repr(e).split())[:400]
        print(f"PROBE {name}: FAIL {msg}", flush=True)


def _time_jit(fn, x, n1=4, n2=12):
    r = fn(x)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), r)

    def run_n(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(x)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        return time.perf_counter() - t0

    run_n(2)
    ms = []
    for _ in range(3):
        t1, t2 = run_n(n1), run_n(n2)
        ms.append((t2 - t1) / (n2 - n1) * 1000)
    return float(np.median(ms))


def _s2d44(xb, out_dtype):
    """(B,256,192,3) -> (B,66,50,64): x4[u,v,16*t? no: (t,s,c) packed as
    t*12+s*3+c in 48 lanes, zero-padded to 64."""
    B = xb.shape[0]
    xp = jnp.pad(xb, ((0, 0), (3, 5), (3, 5), (0, 0)))
    x4 = xp.reshape(B, 66, 4, 50, 4, 3)
    x4 = jnp.transpose(x4, (0, 1, 3, 2, 4, 5)).reshape(B, 66, 50, 48)
    x4 = jnp.pad(x4, ((0, 0), (0, 0), (0, 0), (0, 16)))
    return x4.astype(out_dtype)


def probe_F2():
    """normalize + 4x4 s2d, bf16 out (the composed serving-prep cost)."""
    from tpupose.ops.preprocess import normalize_images

    B = 128

    @jax.jit
    def prep(x):
        return _s2d44(normalize_images(x), jnp.bfloat16)

    x = jnp.asarray(np.random.RandomState(0)
                    .randint(0, 256, (B, 256, 192, 3), np.uint8))
    ms = _time_jit(prep, x)
    # correctness spot-check at an interior point
    xr = np.asarray(jax.jit(normalize_images)(x), np.float32)
    rr = np.asarray(prep(x), np.float32)
    u, v, t, s, c = 10, 11, 2, 3, 1
    want = xr[0, 4 * u + t - 3, 4 * v + s - 3, c]
    got = rr[0, u, v, t * 12 + s * 3 + c]
    return {"ms_per_b128": round(ms, 3), "spot_err": float(abs(want - got))}


def probe_F3():
    """4x4 s2d straight from uint8 to int8 (x - 128), no normalize: the
    1-byte-operand variant (needs an in-kernel i8->bf16 cast, probe E2)."""
    B = 128

    @jax.jit
    def prep(x):
        xi = (x.astype(jnp.int16) - 128).astype(jnp.int8)
        return _s2d44(xi, jnp.int8)

    x = jnp.asarray(np.random.RandomState(0)
                    .randint(0, 256, (B, 256, 192, 3), np.uint8))
    return {"ms_per_b128": round(_time_jit(prep, x), 3)}


def probe_E2():
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...].astype(jnp.bfloat16) * 2.0

    x = jnp.asarray(np.random.RandomState(0)
                    .randint(-128, 128, (8, 256)).astype(np.int8))
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.bfloat16))(x)
    ref = np.asarray(x, np.float32) * 2.0
    return {"max_err": float(np.abs(np.asarray(out, np.float32) - ref).max())}


def probe_E3():
    def k(x_ref, o_ref):
        v = x_ref[...].astype(jnp.float32)
        o_ref[...] = v.astype(jnp.bfloat16)

    x = jnp.asarray(np.random.RandomState(0)
                    .randint(-128, 128, (8, 256)).astype(np.int8))
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.bfloat16))(x)
    ref = np.asarray(x, np.float32)
    return {"max_err": float(np.abs(np.asarray(out, np.float32) - ref).max())}


def probe_I8MM():
    """int8 x int8 -> int32 matmul in-kernel (MXU int8 path) — would let
    the stem matmuls run at int8 rate with exact integer inputs."""
    def k(x_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randint(-128, 128, (256, 512)).astype(np.int8))
    w = jnp.asarray(rs.randint(-128, 128, (512, 256)).astype(np.int8))
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int32))(x, w)
    ref = np.asarray(x, np.int64) @ np.asarray(w, np.int64)
    return {"max_err": float(np.abs(np.asarray(out, np.int64) - ref).max())}


if __name__ == "__main__":
    print(f"devices={jax.devices()}", flush=True)
    run("E2_int8_to_bf16_cast", probe_E2)
    run("E3_int8_to_f32_cast", probe_E3)
    run("I8MM_int8_matmul", probe_I8MM)
    run("F2_s2d44_bf16_prep", probe_F2)
    run("F3_s2d44_int8_prep", probe_F3)
    print("ALL PROBES DONE", flush=True)
