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
``grid_sample(full_image, grid)`` wherever the bilinear footprint is inside
the crop; callers guarantee this for consumed pixels).  Inference-only — the
training step keeps the differentiable XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 1024


def _point_weights(g, hs, ws, height, width, y_off, x_off):
    ix = ((g[:, 0:1] + 1.0) * width - 1.0) * 0.5 - x_off      # [T, 1]
    iy = ((g[:, 1:2] + 1.0) * height - 1.0) * 0.5 - y_off
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = ix - x0
    wy = iy - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, ws - 2)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, hs - 2)
    return x0i, y0i, wx, wy


def _kernel_bf16(grid_ref, src_ref, csel_ref, out_ref, *, hs, ws, height,
                 width, y_off, x_off, channels):
    """bf16 path: both bilinear weights folded into one-hot matrices
    (weight quantization <=2^-9, below the bf16 pixel quantum).  The
    column weights contract FIRST against a width-major source with
    channels stacked along lanes — one dot serves every channel and the
    remaining row blend runs on the smaller [T, C*Hs] intermediate — and
    the final per-channel reduction is a block-ones matmul instead of
    lane reductions (VPU passes dominate this kernel's cost).

    src_ref: [1, Ws_pad, C*Hs_pad] width-major; csel_ref: [C*Hs_pad, C].
    """
    g = grid_ref[0]                                           # [T, 2] f32
    x0i, y0i, wx, wy = _point_weights(g, hs, ws, height, width, y_off,
                                      x_off)
    hs_pad = src_ref.shape[2] // channels
    dt = src_ref.dtype
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, hs_pad), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, src_ref.shape[1]), 1)
    wxl = wx.astype(dt)
    colw = ((cols == x0i).astype(dt) * (1 - wxl)
            + (cols == x0i + 1).astype(dt) * wxl)
    wyl = wy.astype(dt)
    rowy = ((rows == y0i).astype(dt) * (1 - wyl)
            + (rows == y0i + 1).astype(dt) * wyl)
    tmp = jnp.dot(colw, src_ref[0],
                  preferred_element_type=jnp.float32)         # [T, C*Hs]
    rowy3 = jnp.concatenate([rowy] * channels, axis=1)
    out_ref[0] = jnp.dot(rowy3 * tmp.astype(dt), csel_ref[...],
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


def _kernel(grid_ref, src_ref, out_ref, *, hs, ws, height, width,
            y_off, x_off, channels):
    """f32 path: exact 0/1 indicator matmuls with an f32 row blend (the
    training/parity path keeps full precision; the bf16 kernel above is
    the serving path)."""
    g = grid_ref[0]                                           # [T, 2] f32
    x0i, y0i, wx, wy = _point_weights(g, hs, ws, height, width, y_off,
                                      x_off)
    hs_pad = src_ref.shape[2]
    ws_pad = src_ref.shape[3]
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, hs_pad), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, ws_pad), 1)
    colw = ((cols == x0i).astype(jnp.float32) * (1.0 - wx)
            + (cols == x0i + 1).astype(jnp.float32) * wx)     # [T, Ws]
    ind0 = (rows == y0i).astype(jnp.float32)                  # [T, Hs] 0/1
    ind1 = (rows == y0i + 1).astype(jnp.float32)
    outs = []
    for ch in range(channels):
        src = src_ref[0, ch]                                  # [Hs, Ws]
        g0 = jnp.dot(ind0, src, preferred_element_type=jnp.float32)
        g1 = jnp.dot(ind1, src, preferred_element_type=jnp.float32)
        gc = g0 * (1.0 - wy) + g1 * wy                        # [T, Ws] f32
        outs.append(jnp.sum(colw * gc, axis=1, keepdims=True))
    out_ref[0] = jnp.concatenate(outs, axis=1).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("y_off", "x_off", "height", "width",
                                    "tile"))
def window_sample(src: jnp.ndarray, grid: jnp.ndarray, y_off: int,
                  x_off: int, height: int, width: int,
                  tile: int = DEFAULT_TILE) -> jnp.ndarray:
    """Bilinear-sample a source crop at P grid points, fused on-chip.

    Args:
      src:  [B, Hs, Ws, C] crop = image[y_off:y_off+Hs, x_off:x_off+Ws].
      grid: [B, P, 2] (x, y) in [-1, 1] normalized to the FULL image of size
        (height, width), torch align_corners=False convention.
    Returns:
      [B, P, C] in src.dtype.
    """
    b, hs, ws, c = src.shape
    p = grid.shape[1]
    hs_pad = -(-hs // 8) * 8
    ws_pad = -(-ws // 128) * 128
    p_pad = -(-p // tile) * tile
    grid_p = jnp.pad(grid.astype(jnp.float32),
                     ((0, 0), (0, p_pad - p), (0, 0)))
    kw = dict(hs=hs, ws=ws, height=height, width=width, y_off=y_off,
              x_off=x_off, channels=c)
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
            functools.partial(_kernel_bf16, **kw),
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
        )(grid_p, src_t, csel)
        return out[:, :p]

    # f32 path: [B, C, Hs, Ws], channels as a python loop in the kernel
    src_t = jnp.transpose(src, (0, 3, 1, 2))
    src_t = jnp.pad(src_t, ((0, 0), (0, 0), (0, hs_pad - hs),
                            (0, ws_pad - ws)))
    out = pl.pallas_call(
        functools.partial(_kernel, **kw),
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
    )(grid_p, src_t)
    return out[:, :p]
