"""Steady-state timing for TPU probes behind the axon tunnel.

One shared implementation for the probe/evidence scripts
(scripts/r4_engine_tpu.py, r5_mxu_probe.py, r5_tallconv_probe.py) so a
methodology fix cannot silently diverge between them (round-5 review).

The axon tunnel adds a ~25-30 ms constant per blocking host fetch;
chaining n async dispatches and fitting the slope between two chain
lengths removes it (same method as bench.py's _steady_s).
"""
from __future__ import annotations

import time

import jax
import numpy as np

# below this per-iteration slope (5 us) the fit is smaller than host
# jitter on the short leg and the "measurement" is noise, not data
MIN_RELIABLE_SLOPE_S = 5e-6


def median_time(fn, *args, n1: int = 4, n2: int = 16) -> float:
    """Median steady-state seconds/iteration of fn(*args) over three
    two-point slope fits. Raises RuntimeError when the fit degenerates
    (slope at or below the noise floor) instead of returning an absurd
    number — round-5 review: the old max(slope, 1e-9) clamp turned
    failed measurements into '0.000 ms / 2.9e7 TFLOP/s' rows that were
    committed as evidence. Raise n1/n2 for sub-100us probes."""

    def run(n):
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
        return time.perf_counter() - t0

    run(2)
    run(2)
    slopes = []
    for _ in range(5):
        t1 = run(n1)
        t2 = run(n2)
        slopes.append((t2 - t1) / (n2 - n1))
    med = float(np.median(slopes))
    if med <= MIN_RELIABLE_SLOPE_S:
        raise RuntimeError(
            f"degenerate slope fit ({med * 1e6:.2f} us/iter <= "
            f"{MIN_RELIABLE_SLOPE_S * 1e6:.0f} us noise floor) — "
            f"increase n1/n2 to make the probe measurable")
    return med
