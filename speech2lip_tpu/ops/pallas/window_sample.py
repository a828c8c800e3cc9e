"""Fused windowed bilinear sampling kernel (Pallas/TPU).

The post-fusion composite backward-warps the canonical face through the
per-frame ``coord`` grid (reference tf_nerf.py:366-367).  The XLA
formulation (ops/grid_sample.grid_sample_onehot) factors the bilinear
gather into two one-hot contractions, which materializes [B, P, Hs] one-hot
and [B, P, Ws·C] interpolation intermediates in HBM — ~10 GB of traffic per
May-geometry batch and ~12 ms/step measured on v5e, the second-largest
inference cost after the U-Net.

This kernel fuses the whole sample per output tile in VMEM: the source crop
(≈170² px) is VMEM-resident, row selection runs as two exact 0/1-indicator
MXU matmuls (f32 accumulation), and the row/column interpolation happens in
registers — nothing but the grid, the crop, and the output touches HBM
(≈12 MB per batch, a ~800× traffic reduction).

Semantics: identical to grid_sample_onehot (and therefore to
``grid_sample(full_image, grid)``) wherever the bilinear footprint is inside
the crop; callers guarantee this for consumed pixels.  Samples whose
footprint leaves the crop read as 0 (hat weights vanish) where the previous
formulation clamped to the crop edge — both are junk the callers mask out.
Inference-only — the training step keeps the differentiable XLA path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 1024

# CPU testing escape hatch: PALLAS_INTERPRET=1 runs the sampling kernels
# (this module and hat_sample — pure dots/iota, no Mosaic-only ops)
# through the Pallas interpreter so the pytest suite covers them without
# TPU hardware.
INTERPRET = os.environ.get("PALLAS_INTERPRET", "") == "1"

# v5e carries far more physical VMEM than the 16 MB default scoped limit
# (see conv_hcw._VMEM_LIMIT); the raised budget lets the point tiles grow
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


def _kernel_bf16(ixy_ref, src_ref, csel_ref, out_ref, *, channels):
    """bf16 path: both bilinear weights built as hat functions
    ``max(0, 1 - |ix - col|)`` — for any sample whose 2x2 footprint lies
    inside the crop this equals the floor/frac one-hot exactly, with no
    floor/clip/compare chains (the [T, 1] scalar chains of the previous
    formulation ran at 1/128 lane utilization and dominated the kernel).
    The crop-local coordinates (ix, iy) arrive precomputed from XLA.
    Weight quantization <= 2^-9 after the bf16 cast, below the bf16
    pixel quantum.  The column weights contract FIRST against a
    width-major source with channels stacked along lanes — one dot
    serves every channel and the remaining row blend runs on the smaller
    [T, C*Hs] intermediate — and the final per-channel reduction is a
    block-ones matmul instead of lane reductions.

    ixy_ref: [1, T, 2] crop-local (ix, iy) f32;
    src_ref: [1, Ws_pad, C*Hs_pad] width-major; csel_ref: [C*Hs_pad, C].
    """
    ixy = ixy_ref[0]                                          # [T, 2] f32
    ix = ixy[:, 0:1]
    iy = ixy[:, 1:2]
    hs_pad = src_ref.shape[2] // channels
    dt = src_ref.dtype
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (1, hs_pad), 1).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (1, src_ref.shape[1]), 1).astype(jnp.float32)
    colw = jnp.maximum(1.0 - jnp.abs(ix - cols), 0.0).astype(dt)
    rowy = jnp.maximum(1.0 - jnp.abs(iy - rows), 0.0).astype(dt)
    tmp = jnp.dot(colw, src_ref[0],
                  preferred_element_type=jnp.float32)         # [T, C*Hs]
    rowy3 = jnp.concatenate([rowy] * channels, axis=1)
    out_ref[0] = jnp.dot(rowy3 * tmp.astype(dt), csel_ref[...],
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


def _kernel(ixy_ref, src_ref, out_ref, *, channels):
    """f32 path: hat-function row weights contract in ONE f32 matmul per
    channel (the previous indicator form needed two), column hat weights
    reduce on the VPU (the training/parity path keeps full precision; the
    bf16 kernel above is the serving path)."""
    ixy = ixy_ref[0]                                          # [T, 2] f32
    ix = ixy[:, 0:1]
    iy = ixy[:, 1:2]
    hs_pad = src_ref.shape[2]
    ws_pad = src_ref.shape[3]
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (1, hs_pad), 1).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (1, ws_pad), 1).astype(jnp.float32)
    colw = jnp.maximum(1.0 - jnp.abs(ix - cols), 0.0)         # [T, Ws]
    roww = jnp.maximum(1.0 - jnp.abs(iy - rows), 0.0)         # [T, Hs]
    outs = []
    for ch in range(channels):
        src = src_ref[0, ch]                                  # [Hs, Ws]
        # HIGHEST: Mosaic's default lowers f32 dots through single-pass
        # bf16 (~2^-8 relative error) — this is the full-precision path
        gc = jnp.dot(roww, src, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        outs.append(jnp.sum(colw * gc, axis=1, keepdims=True))
    out_ref[0] = jnp.concatenate(outs, axis=1).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("y_off", "x_off", "height", "width",
                                    "tile"))
def window_sample(src: jnp.ndarray, grid: jnp.ndarray, y_off: int,
                  x_off: int, height: int, width: int,
                  tile: int = 0) -> jnp.ndarray:
    """Bilinear-sample a source crop at P grid points, fused on-chip.

    Args:
      src:  [B, Hs, Ws, C] crop = image[y_off:y_off+Hs, x_off:x_off+Ws].
      grid: [B, P, 2] (x, y) in [-1, 1] normalized to the FULL image of size
        (height, width), torch align_corners=False convention.
      tile: points per program; 0 = auto (the largest of 1024/2048/4096
        whose live intermediates fit a ~12 MB VMEM budget — bigger tiles
        amortize per-program overhead, measured 5.8 -> 4.7 ms/batch-32 at
        May geometry going 1024 -> 4096).
    Returns:
      [B, P, C] in src.dtype.
    """
    b, hs, ws, c = src.shape
    p = grid.shape[1]
    hs_pad = -(-hs // 8) * 8
    ws_pad = -(-ws // 128) * 128
    if not tile:
        per_point = 4 * (ws_pad + hs_pad) + 8 * c * hs_pad
        tile = DEFAULT_TILE
        for cand in (2048, 4096, 8192, 16384):
            if cand * per_point <= 40 * 2**20:
                tile = cand
    p_pad = -(-p // tile) * tile
    grid_p = jnp.pad(grid.astype(jnp.float32),
                     ((0, 0), (0, p_pad - p), (0, 0)))
    # crop-local sample coordinates, computed in XLA (a trivial
    # elementwise map that fuses with the grid producer) so the kernels
    # contain no per-point scalar chains ([T, 1]-shaped op chains run at
    # 1/128 lane utilization inside Mosaic and dominated this kernel)
    ixy = jnp.stack(
        [(grid_p[..., 0] + 1.0) * (width * 0.5) - (0.5 + x_off),
         (grid_p[..., 1] + 1.0) * (height * 0.5) - (0.5 + y_off)],
        axis=-1)
    gspec = pl.BlockSpec((1, tile, 2), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, tile, c), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * b * p_pad * hs_pad * ws_pad * c * 2,
        bytes_accessed=(grid_p.size * 4 + src.size * src.dtype.itemsize
                        + b * p_pad * c * src.dtype.itemsize),
        transcendentals=0)

    if src.dtype != jnp.float32:
        # width-major source, channels stacked along lanes:
        # src_t[b, w, ch*Hs+h] = src[b, h, w, ch]
        src_t = jnp.pad(src, ((0, 0), (0, hs_pad - hs),
                              (0, ws_pad - ws), (0, 0)))
        src_t = jnp.transpose(src_t, (0, 2, 3, 1)).reshape(
            b, ws_pad, c * hs_pad)
        csel = (jnp.arange(c * hs_pad)[:, None] // hs_pad
                == jnp.arange(c)[None, :]).astype(src.dtype)
        out = pl.pallas_call(
            functools.partial(_kernel_bf16, channels=c),
            grid=(b, p_pad // tile),
            in_specs=[
                gspec,
                pl.BlockSpec((1, ws_pad, c * hs_pad),
                             lambda bb, i: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(csel.shape, lambda bb, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((b, p_pad, c), src.dtype),
            cost_estimate=cost,
            compiler_params=_VMEM_LIMIT,
            interpret=INTERPRET,
        )(ixy, src_t, csel)
        return out[:, :p]

    # f32 path: [B, C, Hs, Ws], channels as a python loop in the kernel
    src_t = jnp.transpose(src, (0, 3, 1, 2))
    src_t = jnp.pad(src_t, ((0, 0), (0, 0), (0, hs_pad - hs),
                            (0, ws_pad - ws)))
    out = pl.pallas_call(
        functools.partial(_kernel, channels=c),
        grid=(b, p_pad // tile),
        in_specs=[
            gspec,
            pl.BlockSpec((1, c, hs_pad, ws_pad),
                         lambda bb, i: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((b, p_pad, c), src.dtype),
        cost_estimate=cost,
        compiler_params=_VMEM_LIMIT,
        interpret=INTERPRET,
    )(ixy, src_t)
    return out[:, :p]
