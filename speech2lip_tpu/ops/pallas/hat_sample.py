"""Differentiable bilinear sampler with dense-MXU forward AND backward.

The train step contains two gathers XLA handles badly on TPU (measured
v5e, May geometry, tools/bench_train.py --ablate / tools/bench_gather.py):

- the blackaug composite's differentiable window gather
  (models/talking_face.post_fusion_composite, reference tf_nerf.py:366),
  whose backward w.r.t. the SOURCE lowers to a 500² scatter-add;
- the canonical-depth loss warp (train/train_step.py, reference
  training.py:296-314), whose sample grid depends on the learned depth so
  the forward gather (XLA take_along_axis, ~8 ms/frame) cannot move to
  the host.

This module replaces both with hat-function contractions
(``w = max(0, 1 - |ix - col|)`` — exactly the bilinear weights wherever
the 2x2 footprint is in range, see ops/pallas/window_sample.py):

  forward      out[t, c] = rowy[t] · S_c · colw[t]^T      (window_sample)
  d/d source   dS_c      = (rowy ⊙ g_c)^T @ colw          (one dot/channel)
  d/d grid     dix[t]    = Σ_c g[t,c] · rowy[t]·S_c·hat'(ix)^T
               (two forward-shaped dots with derivative weights)

i.e. the scatter-add backward becomes a dense [Hs, T]x[T, Ws] matmul and
the take_along_axis forward becomes the window_sample kernel.  Everything
is exact in f32; in bf16 the weights quantize at 2^-9 (at or below the
activation quantum — the bf16 train path already accepts this).

Padding semantics:
- ``border=False``: zeros — out-of-range footprints contribute 0 (hat
  weights vanish), and source/grid gradients are 0 there;
- ``border=True``: the grid is clamped to the crop's pixel range in an
  XLA prepass OUTSIDE the custom_vjp, so clamping and its (zero)
  gradient ride ordinary autodiff, matching grid_sample(..., 'border')
  for in-frame crops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speech2lip_tpu.ops.pallas.window_sample import (INTERPRET,
                                                     _VMEM_LIMIT,
                                                     window_sample)

_TILE = 1024


def _pads(hs, ws, p, tile):
    return -(-hs // 8) * 8, -(-ws // 128) * 128, -(-p // tile) * tile


def _crop_ixy(grid, y_off, x_off, height, width):
    """[B, P, 2] normalized grid -> crop-local pixel (ix, iy), f32."""
    g = grid.astype(jnp.float32)
    return jnp.stack(
        [(g[..., 0] + 1.0) * (width * 0.5) - (0.5 + x_off),
         (g[..., 1] + 1.0) * (height * 0.5) - (0.5 + y_off)], axis=-1)


def _dsrc_kernel(ixy_ref, g_ref, out_ref, *, channels, dt):
    """Accumulate dL/dsrc for one point tile.

    ixy_ref: [1, T, 2] crop-local coords; g_ref: [1, T, C] cotangent;
    out_ref: [1, C, Hs_pad, Ws_pad] f32, resident across the tile axis.
    ``dt``: the sampler's compute dtype — bf16 quantizes the hat weights
    at 2^-9 (consistent with the bf16 forward); f32 contracts at HIGHEST
    (Mosaic's default f32 dot is single-pass bf16, ~2^-8 error).
    """
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    ixy = ixy_ref[0]
    ix = ixy[:, 0:1]
    iy = ixy[:, 1:2]
    hs_pad = out_ref.shape[2]
    ws_pad = out_ref.shape[3]
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32 else None)
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (1, hs_pad), 1).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (1, ws_pad), 1).astype(jnp.float32)
    rowy = jnp.maximum(1.0 - jnp.abs(iy - rows), 0.0)        # [T, Hs]
    colw = jnp.maximum(1.0 - jnp.abs(ix - cols), 0.0).astype(dt)
    g = g_ref[0].astype(jnp.float32)                         # [T, C]
    for c in range(channels):
        m = (rowy * g[:, c:c + 1]).astype(dt)                # [T, Hs]
        ds = jax.lax.dot_general(
            m, colw, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                                  # [Hs, Ws]
        out_ref[0, c] += ds


def _dgrid_kernel(ixy_ref, src_ref, csel_ref, g_ref, out_ref, *, channels):
    """dL/d(ix, iy) for one point tile (two forward-shaped contractions
    with derivative weights; hat'(u) = -sign(u) on |u| < 1).

    src_ref: [1, Ws_pad, C*Hs_pad] width-major (window_sample layout);
    out_ref: [1, T, 2] f32.
    """
    ixy = ixy_ref[0]
    ix = ixy[:, 0:1]
    iy = ixy[:, 1:2]
    hs_pad = src_ref.shape[2] // channels
    dt = src_ref.dtype
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (1, hs_pad), 1).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (1, src_ref.shape[1]), 1).astype(jnp.float32)
    ux = ix - cols                                           # [T, Ws]
    uy = iy - rows                                           # [T, Hs]
    colw = jnp.maximum(1.0 - jnp.abs(ux), 0.0)
    rowy = jnp.maximum(1.0 - jnp.abs(uy), 0.0)
    # d hat(u) / d ix = -sign(u) where |u| < 1 (measure-zero kinks get 0)
    dcol = jnp.where(jnp.abs(ux) < 1.0, -jnp.sign(ux), 0.0)
    drow = jnp.where(jnp.abs(uy) < 1.0, -jnp.sign(uy), 0.0)

    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32 else None)

    def blend(cw, rw):
        tmp = jnp.dot(cw.astype(dt), src_ref[0],
                      preferred_element_type=jnp.float32,
                      precision=prec)                        # [T, C*Hs]
        rw3 = jnp.concatenate([rw.astype(dt)] * channels, axis=1)
        return jnp.dot(rw3 * tmp.astype(dt), csel_ref[...],
                       preferred_element_type=jnp.float32,
                       precision=prec)                       # [T, C]

    g = g_ref[0].astype(jnp.float32)
    dix = jnp.sum(blend(dcol, rowy) * g, axis=1, keepdims=True)
    diy = jnp.sum(blend(colw, drow) * g, axis=1, keepdims=True)
    out_ref[0] = jnp.concatenate([dix, diy], axis=1)


def _dsrc(ixy, g, hs, ws, c, dtype, tile=_TILE):
    b, p, _ = ixy.shape
    hs_pad, ws_pad, p_pad = _pads(hs, ws, p, tile)
    ixy_p = jnp.pad(ixy, ((0, 0), (0, p_pad - p), (0, 0)),
                    constant_values=-2.0)  # pad points: hat weights vanish
    g_p = jnp.pad(g, ((0, 0), (0, p_pad - p), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_dsrc_kernel, channels=c, dt=jnp.dtype(dtype)),
        grid=(b, p_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, 2), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, hs_pad, ws_pad),
                               lambda bb, i: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, hs_pad, ws_pad),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p_pad * hs_pad * ws_pad * c,
            bytes_accessed=(ixy_p.size + g_p.size
                            + b * c * hs_pad * ws_pad) * 4,
            transcendentals=0),
        compiler_params=_VMEM_LIMIT,
        interpret=INTERPRET,
    )(ixy_p, g_p)
    return jnp.transpose(out[:, :, :hs, :ws], (0, 2, 3, 1)).astype(dtype)


def _dgrid(ixy, src, g, tile=0):
    b, hs, ws, c = src.shape
    p = ixy.shape[1]
    if not tile:
        # two forward-shaped blends live at once: weight/derivative maps
        # (4 f32 [T, Ws/Hs]) + per-blend [T, C*Hs] f32 tmp + bf16 copies;
        # pick the largest tile inside the raised VMEM budget (the 16 MB
        # default OOMed tile 1024 at full-frame 500² sources)
        per_point = 8 * (ws + hs) + 10 * c * -(-hs // 8) * 8
        tile = 256
        for cand in (512, 1024, 2048):
            if cand * per_point <= 40 * 2**20:
                tile = cand
    hs_pad, ws_pad, p_pad = _pads(hs, ws, p, tile)
    ixy_p = jnp.pad(ixy, ((0, 0), (0, p_pad - p), (0, 0)),
                    constant_values=-2.0)
    g_p = jnp.pad(g, ((0, 0), (0, p_pad - p), (0, 0)))
    src_t = jnp.pad(src, ((0, 0), (0, hs_pad - hs), (0, ws_pad - ws),
                          (0, 0)))
    src_t = jnp.transpose(src_t, (0, 2, 3, 1)).reshape(
        b, ws_pad, c * hs_pad)
    csel = (jnp.arange(c * hs_pad)[:, None] // hs_pad
            == jnp.arange(c)[None, :]).astype(src.dtype)
    out = pl.pallas_call(
        functools.partial(_dgrid_kernel, channels=c),
        grid=(b, p_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, 2), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ws_pad, c * hs_pad),
                         lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(csel.shape, lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, 2), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, p_pad, 2), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * p_pad * hs_pad * ws_pad * c,
            bytes_accessed=(ixy_p.size + g_p.size + b * p_pad * 2) * 4
            + src_t.size * src_t.dtype.itemsize,
            transcendentals=0),
        compiler_params=_VMEM_LIMIT,
        interpret=INTERPRET,
    )(ixy_p, src_t, csel, g_p)
    return out[:, :p]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _hat_core(src, grid, y_off, x_off, height, width):
    return window_sample(src, grid, y_off, x_off, height, width)


def _hat_fwd(src, grid, y_off, x_off, height, width):
    out = window_sample(src, grid, y_off, x_off, height, width)
    return out, (src, grid)


def _hat_bwd(y_off, x_off, height, width, res, g):
    src, grid = res
    b, hs, ws, c = src.shape
    ixy = _crop_ixy(grid, y_off, x_off, height, width)
    dsrc = _dsrc(ixy, g.astype(jnp.float32), hs, ws, c, src.dtype)
    dixy = _dgrid(ixy, src, g.astype(src.dtype))
    # chain through the crop-local map: d ix / d gx = width/2 etc.
    dgrid = jnp.stack([dixy[..., 0] * (width * 0.5),
                       dixy[..., 1] * (height * 0.5)],
                      axis=-1).astype(grid.dtype)
    return dsrc, dgrid


_hat_core.defvjp(_hat_fwd, _hat_bwd)


def hat_sample(src: jnp.ndarray, grid: jnp.ndarray, y_off: int = 0,
               x_off: int = 0, height: int = None, width: int = None,
               border: bool = False) -> jnp.ndarray:
    """Differentiable bilinear sampling of a source crop (TPU Pallas).

    Args:
      src:  [B, Hs, Ws, C] crop = image[y_off:y_off+Hs, x_off:x_off+Ws].
      grid: [B, P, 2] (x, y) in [-1, 1] normalized to the FULL image of
        size (height, width) (defaults: the crop itself), torch
        align_corners=False convention.
      border: clamp samples to the crop's pixel range (matches
        grid_sample(..., 'border') when the crop is the full frame);
        False = zeros padding.
    Returns:
      [B, P, C]; differentiable w.r.t. ``src`` and ``grid``.
    """
    b, hs, ws, c = src.shape
    height = hs if height is None else height
    width = ws if width is None else width
    if border:
        # pixel range [0, Ws-1] in normalized coordinates (exact inverse
        # of the crop-local map); clip is autodiffed by XLA, giving the
        # standard zero position-gradient when clamped
        lo_x = (2.0 * (x_off + 0) + 1.0) / width - 1.0
        hi_x = (2.0 * (x_off + ws - 1) + 1.0) / width - 1.0
        lo_y = (2.0 * (y_off + 0) + 1.0) / height - 1.0
        hi_y = (2.0 * (y_off + hs - 1) + 1.0) / height - 1.0
        grid = jnp.stack([jnp.clip(grid[..., 0], lo_x, hi_x),
                          jnp.clip(grid[..., 1], lo_y, hi_y)], axis=-1)
    return _hat_core(src, grid, y_off, x_off, height, width)
