"""Pallas TPU kernel: batched affine bilinear warp as MXU matmuls.

The XLA formulation of an affine warp (ops/affine.affine_warp) lowers to
4 scalarized gathers — measured 108 ms for a (64, 256, 192, 3) batch on a
v5e chip, slower than the HRNet-W32 train step it feeds. TPUs have no
vector gather; they have a 128x128 systolic array. So the kernel
reformulates bilinear sampling as dense matmuls:

Source coordinates are linear in the output position:
s(xo, yo) = A @ [xo, yo] + t. The bilinear weight of source row y for
output pixel p is the hat function  wy(y; p) = max(0, 1 - |sy(p) - y|)
— exactly the two-tap (1-f, f) pair, and exactly zero outside the
image (matching affine_warp's zero-fill). Then:

    out[p, c] = sum_x wx(x; p) * [ sum_y wy(y; p) * src[c, y, x] ]

The inner sum is a (TILE*Wo, Hs) @ (Hs, Ws) MXU matmul per channel per
row band, with the source image resident in VMEM across the band loop;
the outer sum is a cheap VPU two-tap reduce. No gathers anywhere.
Channels ride in a planar (C, H, W) layout so the image width fills the
lane dimension (NHWC with C=3 would waste 125/128 lanes).

Cost: Ho*Wo*Hs*Ws*C*2 FLOPs per image — ~0.9 TFLOP for the batch above,
a few ms on the MXU vs 108 ms of XLA gathers. Exactness vs the XLA
oracle: tests/test_pallas_warp.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 8  # output rows per grid step


def _warp_kernel(mat_ref, src_ref, out_ref):
    """One (image, row-band) grid cell.

    mat_ref: (1, 2, 3) VMEM — dst->src affine matrix for this image.
    src_ref: (1, C, Hs, Ws) VMEM — whole source image (resident per image).
    out_ref: (1, C, TILE, Wo) VMEM.
    """
    C, Hs, Ws = src_ref.shape[1], src_ref.shape[2], src_ref.shape[3]
    Wo = out_ref.shape[3]
    band = pl.program_id(1)

    a00 = mat_ref[0, 0, 0]
    a01 = mat_ref[0, 0, 1]
    t0 = mat_ref[0, 0, 2]
    a10 = mat_ref[0, 1, 0]
    a11 = mat_ref[0, 1, 1]
    t1 = mat_ref[0, 1, 2]

    def fiota(shape, dim):  # Mosaic iota is integer-only; cast after
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(
            jnp.float32)

    yo = (band * TILE).astype(jnp.float32) + fiota((TILE, Wo), 0)
    xo = fiota((TILE, Wo), 1)
    sx = a00 * xo + a01 * yo + t0            # (TILE, Wo) source x
    sy = a10 * xo + a11 * yo + t1            # (TILE, Wo) source y

    ys = fiota((TILE, Wo, Hs), 2)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy[..., None] - ys))
    wy2 = wy.reshape(TILE * Wo, Hs)
    xs = fiota((TILE, Wo, Ws), 2)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx[..., None] - xs))

    for c in range(C):  # static channel loop (3 for RGB)
        R = jax.lax.dot_general(
            wy2, src_ref[0, c],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                     # (TILE*Wo, Ws)
        out_ref[0, c] = jnp.sum(R.reshape(TILE, Wo, Ws) * wx, axis=2)


def pallas_affine_warp(images, matrices, out_size, interpret: bool = False):
    """Batched affine bilinear warp, (B,Hs,Ws,C),(B,2,3) -> (B,Ho,Wo,C) f32.

    Numerically matches ops/affine.batched_affine_warp (zero fill outside
    the source). Requires Ho % 8 == 0 (use the XLA path otherwise).
    """
    B, Hs, Ws, C = images.shape
    Ho, Wo = out_size
    if Ho % TILE:
        raise ValueError(f"pallas warp needs Ho % {TILE} == 0, got {Ho}")
    src = jnp.transpose(images.astype(jnp.float32), (0, 3, 1, 2))  # NCHW
    matrices = matrices.astype(jnp.float32)
    flops = 2 * B * Ho * Wo * Hs * Ws * C
    out = pl.pallas_call(
        _warp_kernel,
        grid=(B, Ho // TILE),
        in_specs=[
            pl.BlockSpec((1, 2, 3), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, Hs, Ws), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, TILE, Wo), lambda b, t: (b, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, Ho, Wo), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=int(images.size * 8),
            transcendentals=0),
        interpret=interpret,
    )(matrices, src)
    return jnp.transpose(out, (0, 2, 3, 1))  # back to NHWC


def pallas_crops_from_frames(frames, matrices, out_size,
                             interpret: bool = False):
    """D affine crops out of EACH frame:
    (B,Hs,Ws,C),(B*D,2,3) -> (B*D,Ho,Wo,C), crop n reading frame n // D.

    The detector-crops -> batched-pose stage of the two-stage video
    pipeline (BASELINE config 5): person boxes become dst->src matrices
    and each frame is warped D ways WITHOUT materializing D frame copies —
    crop n's source block maps to its frame in VMEM (n // D is a static
    function of the grid index, so no scalar prefetch is needed).
    """
    B, Hs, Ws, C = frames.shape
    N = matrices.shape[0]
    if N % B:
        raise ValueError(f"matrices ({N}) must be a multiple of frames ({B})")
    D = N // B
    Ho, Wo = out_size
    if Ho % TILE:
        raise ValueError(f"pallas warp needs Ho % {TILE} == 0, got {Ho}")
    src = jnp.transpose(frames.astype(jnp.float32), (0, 3, 1, 2))  # B,C,H,W
    matrices = matrices.astype(jnp.float32)
    out = pl.pallas_call(
        _warp_kernel,
        grid=(N, Ho // TILE),
        in_specs=[
            pl.BlockSpec((1, 2, 3), lambda n, t: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, Hs, Ws), lambda n, t: (n // D, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, TILE, Wo), lambda n, t: (n, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, C, Ho, Wo), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * Ho * Wo * Hs * Ws * C,
            bytes_accessed=int(frames.size * 4 + N * Ho * Wo * C * 4),
            transcendentals=0),
        interpret=interpret,
    )(matrices, src)
    return jnp.transpose(out, (0, 2, 3, 1))


def crops_from_frames_auto(frames, matrices, out_size):
    """Device crops of a frame batch: Pallas on TPU, XLA warp elsewhere."""
    Ho, _ = out_size
    if _on_tpu() and Ho % TILE == 0:
        return pallas_crops_from_frames(frames, matrices, out_size)
    from tpupose.ops.affine import batched_affine_warp

    B = frames.shape[0]
    D = matrices.shape[0] // B
    rep = jnp.repeat(frames.astype(jnp.float32), D, axis=0)
    return batched_affine_warp(rep, matrices, out_size)


def affine_warp_auto(images, matrices, out_size):
    """Fastest available batched warp: the Pallas MXU kernel on TPU, the
    XLA gather path elsewhere (CPU tests, GPU, odd sizes)."""
    Ho, _ = out_size
    if _on_tpu() and Ho % TILE == 0:
        return pallas_affine_warp(images, matrices, out_size)
    from tpupose.ops.affine import batched_affine_warp

    return batched_affine_warp(images.astype(jnp.float32), matrices, out_size)


def _on_tpu() -> bool:
    # 'axon' is the tunneled-TPU plugin platform name in this container
    return jax.default_backend() in ("tpu", "axon")
