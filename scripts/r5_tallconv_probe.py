"""Round-5 probe: does folding batch into the ROW dimension dodge the
layer1 batch-in-lanes layout stall?

BASELINE.md round-3/4: XLA emits every conv touching a 64x48 tensor
with an exotic layout ({0,3,2,1} batch-in-lanes) at ~20% MFU, costing
layer1 ~4.1 ms/b128; every Pallas escape pays shore copies. Untried
idea: reshape (B, 64, 48, C) -> (1, B*66, 48, C) with 2 zero seam rows
per image — with batch=1 XLA cannot choose batch-in-lanes at all. If
tall convs run materially faster per FLOP, a seam-masked tall layer1
is worth building; if not, this is the closing datum on the layout
wall.

Run ON TPU: PYTHONPATH=/root/repo python scripts/r5_tallconv_probe.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from tpupose.utils.cache import enable_compile_cache

enable_compile_cache()


from tpupose.utils.timing import median_time  # noqa: E402


def conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def probe(name, B, H, W, Cin, Cout, k=3, dtype=jnp.bfloat16, n=1):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, H, W, Cin), dtype)
    ws = [jnp.asarray(rs.randn(k, k, Cin if i == 0 else Cout, Cout)
                      * 0.05, dtype) for i in range(n)]

    @jax.jit
    def f(x, ws):
        y = x
        for w in ws:
            y = jax.nn.relu(conv(y, w))
        return y

    try:
        t = median_time(f, x, ws, n1=8, n2=32)
    except Exception as e:  # noqa: BLE001
        print(f"  {name}: FAIL {' '.join(repr(e).split())[:160]}",
              flush=True)
        return
    fl = sum(2.0 * B * H * W * k * k
             * (Cin if i == 0 else Cout) * Cout for i in range(n))
    print(f"  {name}: {t * 1e3:7.3f} ms  {fl / t / 1e12:6.1f} TFLOP/s",
          flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    B = 128
    print("single 3x3 conv + relu, bf16:", flush=True)
    probe("batched  (128,64,48,64)->64 ", B, 64, 48, 64, 64)
    probe("tall     (1,8448,48,64)->64 ", 1, 66 * B, 48, 64, 64)
    probe("batched  (128,64,48,128)->128", B, 64, 48, 128, 128)
    probe("tall     (1,8448,48,128)->128", 1, 66 * B, 48, 128, 128)
    print("3-conv chain (layer1-ish load), bf16:", flush=True)
    probe("batched  chain x3 64ch", B, 64, 48, 64, 64, n=3)
    probe("tall     chain x3 64ch", 1, 66 * B, 48, 64, 64, n=3)
    print("control: 32x24 (stage2 spatial):", flush=True)
    probe("batched  (128,32,24,128)->128", B, 32, 24, 128, 128)
    probe("tall     (1,4352,24,128)->128", 1, 34 * B, 24, 128, 128)


if __name__ == "__main__":
    main()
