"""Probe: lane-offset READS (value slice + scratch-ref slice) at 64-lane
granularity — needed by the fused-phase stem matmul (one (.,576)@(576,256)
matmul, then per-phase lane slices [64a:64a+64])."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        r = fn()
        print(f"PROBE {name}: OK {r}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"PROBE {name}: FAIL {' '.join(repr(e).split())[:300]}",
              flush=True)


def probe_value_read():
    def k(x_ref, o_ref):
        v = x_ref[...]
        o_ref[...] = jnp.maximum(v[:, 64:128], v[:, 192:256])

    x = (jnp.arange(64 * 256, dtype=jnp.float32)
         .reshape(64, 256) % 37).astype(jnp.bfloat16)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((64, 64), jnp.bfloat16))(x)
    xr = np.asarray(x, np.float32)
    ref = np.maximum(xr[:, 64:128], xr[:, 192:256])
    return {"max_err": float(np.abs(np.asarray(out, np.float32) - ref).max())}


def probe_ref_read():
    def k(x_ref, o_ref, s_ref):
        s_ref[...] = x_ref[...] * 2.0
        o_ref[...] = jnp.maximum(s_ref[:, 64:128], s_ref[:, 192:256])

    x = (jnp.arange(64 * 256, dtype=jnp.float32)
         .reshape(64, 256) % 37).astype(jnp.bfloat16)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((64, 64), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((64, 256), jnp.bfloat16)])(x)
    xr = np.asarray(x, np.float32) * 2
    ref = np.maximum(xr[:, 64:128], xr[:, 192:256])
    return {"max_err": float(np.abs(np.asarray(out, np.float32) - ref).max())}


def probe_4d_ref_read():
    """The actual shape used by the stem kernel: (G,64,48,256) scratch,
    phase slices on the lane dim."""
    def k(x_ref, o_ref, s_ref):
        s_ref[...] = x_ref[...] * 1.0
        a = s_ref[:, :, :, 0:64]
        b = s_ref[:, :, :, 64:128]
        c = s_ref[:, :, :, 128:192]
        d = s_ref[:, :, :, 192:256]
        o_ref[...] = jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, d))

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.uniform(-2, 2, (1, 8, 48, 256)), jnp.bfloat16)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 8, 48, 64), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((1, 8, 48, 256), jnp.bfloat16)])(x)
    xr = np.asarray(x, np.float32)
    ref = xr.reshape(1, 8, 48, 4, 64).max(axis=3)
    return {"max_err": float(np.abs(np.asarray(out, np.float32) - ref).max())}


if __name__ == "__main__":
    run("VREAD_value_lane_offset64", probe_value_read)
    run("RREAD_scratch_lane_offset64", probe_ref_read)
    run("RREAD4D_scratch_lane_offset64", probe_4d_ref_read)
    print("DONE", flush=True)
