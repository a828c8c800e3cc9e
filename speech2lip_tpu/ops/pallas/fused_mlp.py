"""Fused TalkingFace MLP-trunk kernel (Pallas/TPU).

The hottest op in the whole pipeline (SURVEY.md §3.4): per frame the renderer
pushes H·W(≈9.6k)×4-ensemble rays through an 8-layer 256-wide MLP.  Left to
XLA, every layer's [N, 256] activation round-trips HBM (≈40 MB/layer at
train-time N), making the chain bandwidth-bound.  This kernel keeps the
activations of a row-tile in VMEM across **all** layers and loads the full
weight set (~2.8 MB fp32) into VMEM once per tile, so HBM traffic drops to
(inputs + outputs + weights) — a ~7× traffic reduction.

Semantics match models/talking_face.mlp_trunk (reference
tf_nerf.py:225-285, MLP v2 with skip at layer 4).  The per-frame audio/time
projections are folded into the entry/skip biases by the wrapper.

All feature dims are padded to the 128-lane TPU tile: uv embedding 42→128,
RGB output 3→128 (sliced by the wrapper).  Matmuls hit the MXU via
``preferred_element_type=float32`` accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
DEFAULT_TILE = 512


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _kernel(uv_ref, w_uv_ref, b0_ref, w_skip_ref, bs_ref,
            w01_ref, b01_ref, w5_ref, b5_ref, w67_ref, b67_ref,
            w_out_ref, b_out_ref, out_ref, *, depth, skip_layer):
    """One row-tile of the fused MLP.

    uv_ref:   [T, 128]  zero-padded uv embedding tile
    w_uv_ref: [128, W]  entry projection (b0 includes per-frame base)
    w_skip:   [128, W]  skip projection (bs includes per-frame skip base)
    w01_ref:  [skip_layer+1, W, W] trunk layers 0..skip_layer
    w5_ref:   [2W, W]   the post-concat layer
    w67_ref:  [depth-skip_layer-2, W, W] remaining layers
    w_out:    [W, 128]  zero-padded output head
    """
    # Per-frame biases arrive as (1, W) blocks (single-frame variant) or
    # (1, 1, W) blocks (batched variant: trailing dims equal to the array
    # dims keep Mosaic's 8x128 tiling rule satisfied); normalize to [1, W].
    b0 = b0_ref[...].reshape(1, -1)
    bs = bs_ref[...].reshape(1, -1)
    uv = uv_ref[:]
    h = jnp.dot(uv, w_uv_ref[:], preferred_element_type=jnp.float32) + b0
    for i in range(skip_layer + 1):
        h = jnp.dot(h, w01_ref[i], preferred_element_type=jnp.float32) + b01_ref[i]
        h = jnp.maximum(h, 0.0)
    h_skip = (jnp.dot(uv, w_skip_ref[:], preferred_element_type=jnp.float32)
              + bs)
    h = jnp.concatenate([h_skip, h], axis=-1)
    h = jnp.dot(h, w5_ref[:], preferred_element_type=jnp.float32) + b5_ref[:]
    h = jnp.maximum(h, 0.0)
    for i in range(depth - skip_layer - 2):
        h = jnp.dot(h, w67_ref[i], preferred_element_type=jnp.float32) + b67_ref[i]
        h = jnp.maximum(h, 0.0)
    out = (jnp.dot(h, w_out_ref[:], preferred_element_type=jnp.float32)
           + b_out_ref[:])
    # out block is [tile, LANE] (single-frame) or [1, tile, LANE] (batched)
    out_ref[...] = out.reshape(out_ref.shape)


@functools.partial(jax.jit, static_argnames=("tile", "skip_layer"))
def fused_mlp_batched(params, uv_emb: jnp.ndarray, base: jnp.ndarray,
                      skip: jnp.ndarray, tile: int = DEFAULT_TILE,
                      skip_layer: int = 4) -> jnp.ndarray:
    """Batched-frames variant: shared [N, E] coords, per-frame [B, W]
    base/skip features -> [B, N, out].  One kernel launch with grid
    (B, N/tile); the per-frame entry/skip biases arrive as (1, W) blocks
    indexed by the frame coordinate — no vmap, no per-frame relaunch."""
    n, e = uv_emb.shape
    b = base.shape[0]
    width = params["fc_uv"]["w"].shape[1]
    depth = len(params["trunk"])
    out_ch = params["output"]["w"].shape[1]

    n_pad = -(-n // tile) * tile
    uv_p = _pad_to(_pad_to(uv_emb, LANE, 1), n_pad, 0).astype(jnp.float32)

    w_uv = _pad_to(params["fc_uv"]["w"], LANE, 0).astype(jnp.float32)
    # [B, 1, W]: the singleton row axis makes the per-frame block (1, 1, W),
    # whose last two dims equal the array dims — legal under Mosaic tiling.
    b0 = (params["fc_uv"]["b"][None, :] + base).astype(jnp.float32)[:, None, :]
    w_skip = _pad_to(params["fc_uv_skip"]["w"], LANE, 0).astype(jnp.float32)
    bs = (params["fc_uv_skip"]["b"][None, :]
          + skip).astype(jnp.float32)[:, None, :]

    w01 = jnp.stack([params["trunk"][i]["w"] for i in range(skip_layer + 1)])
    b01 = jnp.stack([params["trunk"][i]["b"]
                     for i in range(skip_layer + 1)])[:, None, :]
    w5 = params["trunk"][skip_layer + 1]["w"]
    b5 = params["trunk"][skip_layer + 1]["b"][None, :]
    w67 = jnp.stack([params["trunk"][i]["w"]
                     for i in range(skip_layer + 2, depth)])
    b67 = jnp.stack([params["trunk"][i]["b"]
                     for i in range(skip_layer + 2, depth)])[:, None, :]
    w_out = _pad_to(params["output"]["w"], LANE, 1).astype(jnp.float32)
    b_out = _pad_to(params["output"]["b"][None, :], LANE, 1).astype(jnp.float32)

    grid = (b, n_pad // tile)
    row_spec = pl.BlockSpec((tile, LANE), lambda bb, i: (i, 0),
                            memory_space=pltpu.VMEM)
    frame_vec = lambda arr: pl.BlockSpec((1, 1, arr.shape[2]),
                                         lambda bb, i: (bb, 0, 0),
                                         memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(arr.shape,
                                    lambda bb, i: tuple(0 for _ in arr.shape),
                                    memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, depth=depth, skip_layer=skip_layer),
        grid=grid,
        in_specs=[
            row_spec,
            full(w_uv), frame_vec(b0),
            full(w_skip), frame_vec(bs),
            full(w01), full(b01),
            full(w5), full(b5),
            full(w67), full(b67),
            full(w_out), full(b_out),
        ],
        out_specs=pl.BlockSpec((1, tile, LANE), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, LANE), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * width * (LANE * 2 + width * (depth + 1)
                                           + LANE),
            bytes_accessed=4 * (b * n_pad * LANE * 2
                                + (depth + 3) * width * width),
            transcendentals=0,
        ),
    )(uv_p, w_uv, b0, w_skip, bs, w01, b01, w5, b5, w67, b67, w_out, b_out)
    return out[:, :n, :out_ch]


@functools.partial(jax.jit, static_argnames=("tile", "skip_layer"))
def fused_mlp(params, uv_emb: jnp.ndarray, base: jnp.ndarray,
              skip: jnp.ndarray, tile: int = DEFAULT_TILE,
              skip_layer: int = 4) -> jnp.ndarray:
    """Run the TalkingFace trunk over [N, E] uv embeddings.

    Args:
      params: the talking_face param pytree (fc_uv, fc_uv_skip, trunk, output).
      uv_emb: [N, E] (E=42 for uv_embed=10).
      base:   [W] per-frame entry feature (audio+time projections).
      skip:   [W] per-frame skip feature.
    Returns:
      [N, output_ch] float32.
    """
    n, e = uv_emb.shape
    width = params["fc_uv"]["w"].shape[1]
    depth = len(params["trunk"])
    out_ch = params["output"]["w"].shape[1]

    n_pad = -(-n // tile) * tile
    uv_p = _pad_to(_pad_to(uv_emb, LANE, 1), n_pad, 0).astype(jnp.float32)

    w_uv = _pad_to(params["fc_uv"]["w"], LANE, 0).astype(jnp.float32)
    b0 = (params["fc_uv"]["b"] + base).astype(jnp.float32)[None, :]
    w_skip = _pad_to(params["fc_uv_skip"]["w"], LANE, 0).astype(jnp.float32)
    bs = (params["fc_uv_skip"]["b"] + skip).astype(jnp.float32)[None, :]

    w01 = jnp.stack([params["trunk"][i]["w"] for i in range(skip_layer + 1)])
    b01 = jnp.stack([params["trunk"][i]["b"] for i in range(skip_layer + 1)])[:, None, :]
    w5 = params["trunk"][skip_layer + 1]["w"]
    b5 = params["trunk"][skip_layer + 1]["b"][None, :]
    w67 = jnp.stack([params["trunk"][i]["w"]
                     for i in range(skip_layer + 2, depth)])
    b67 = jnp.stack([params["trunk"][i]["b"]
                     for i in range(skip_layer + 2, depth)])[:, None, :]
    w_out = _pad_to(params["output"]["w"], LANE, 1).astype(jnp.float32)
    b_out = _pad_to(params["output"]["b"][None, :], LANE, 1).astype(jnp.float32)

    grid = (n_pad // tile,)
    row_spec = pl.BlockSpec((tile, LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, depth=depth, skip_layer=skip_layer),
        grid=grid,
        in_specs=[
            row_spec,
            full(w_uv.shape), full(b0.shape),
            full(w_skip.shape), full(bs.shape),
            full(w01.shape), full(b01.shape),
            full(w5.shape), full(b5.shape),
            full(w67.shape), full(b67.shape),
            full(w_out.shape), full(b_out.shape),
        ],
        out_specs=pl.BlockSpec((tile, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, LANE), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * width * (LANE * 2 + width * (depth + 1) + LANE),
            bytes_accessed=4 * (n_pad * LANE * 2 + (depth + 3) * width * width),
            transcendentals=0,
        ),
    )(uv_p, w_uv, b0, w_skip, bs, w01, b01, w5, b5, w67, b67, w_out, b_out)
    return out[:n, :out_ch]
