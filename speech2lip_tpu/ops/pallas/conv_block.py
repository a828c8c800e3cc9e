"""Fused 3×3 conv (+folded BN, +ReLU) Pallas kernel for the post-fusion
U-Net inference path.

The U-Net at 500² is the second-largest inference cost (SURVEY.md §3.2).
With XLA convs, every layer runs the MXU at C=64 half-lane occupancy and
leaves fusion opportunities (BN, ReLU) on the table.  This kernel computes
conv3×3 + per-channel scale/bias + ReLU in one pass:

- halo handling without overlapping blocks: the wrapper materializes three
  row-shifted views of the (1-col-zero-padded) input; each program then gets
  x[j−1], x[j], x[j+1] for its row tile through three standard auto-
  pipelined BlockSpecs — no manual DMA, no Mosaic alignment constraints;
- the conv is 9 shifted [rows·W, C]×[C, Co] MXU matmuls accumulated in
  fp32, with the inference BatchNorm folded to scale/bias (``fold_bn``)
  and the ReLU fused;
- ``double_conv_infer`` chains two kernels (one HBM round-trip for the
  intermediate — the row-shifted views make a fully-fused pair unprofitable
  under Mosaic's DMA tiling rules; see git history for the attempt).

Inference-only (the training path keeps XLA convs for autodiff + batch
stats).  Numerically matches models/unet_light._double_conv in eval mode to
bf16/fp32 accumulation tolerance (tests/test_pallas_conv.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(bn_params, bn_state, eps: float = 1e-5):
    """Fold an inference BatchNorm into per-channel (scale, bias):
    conv(x)*scale + bias  ≡  BN(conv(x))."""
    inv = jax.lax.rsqrt(bn_state["var"] + eps)
    scale = bn_params["scale"] * inv
    bias = bn_params["bias"] - bn_state["mean"] * scale
    return scale, bias


def _conv_kernel(x0_ref, x1_ref, x2_ref, w_ref, s_ref, b_ref, out_ref,
                 *, width: int, cin: int, cout: int, relu: bool):
    rows = out_ref.shape[1]
    acc = jnp.zeros((rows * width, cout), jnp.float32)
    for dy, xref in enumerate((x0_ref, x1_ref, x2_ref)):
        xv = xref[0]  # [rows, width+2, cin]
        for dx in range(3):
            patch = xv[:, dx:dx + width, :]
            acc = acc + jnp.dot(patch.reshape(rows * width, cin),
                                w_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    out = acc.reshape(rows, width, cout) * s_ref[0][None, None, :] \
        + b_ref[0][None, None, :]
    if relu:
        out = jnp.maximum(out, 0.0)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("row_tile", "relu"))
def conv3x3_infer(x, w, scale, bias, row_tile: int = 25, relu: bool = True):
    """Fused conv3×3 (padding 1) + scale/bias + optional ReLU.

    x: [B, H, W, Cin]; w: [3, 3, Cin, Cout]; scale/bias: [Cout]
    (fold_bn outputs, or ones/bias for a plain conv).
    """
    bsz, h, w_, cin = x.shape
    cout = w.shape[-1]
    h_pad = -(-h // row_tile) * row_tile
    # rows: +1 halo each side, then three shifted views; cols: zero pad 1
    xp = jnp.pad(x, ((0, 0), (1, 1 + h_pad - h), (1, 1), (0, 0)))
    views = [jax.lax.slice_in_dim(xp, k, k + h_pad, axis=1) for k in range(3)]

    grid = (bsz, h_pad // row_tile)
    xspec = pl.BlockSpec((1, row_tile, w_ + 2, cin),
                         lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda b, i: tuple(0 for _ in arr.shape),
        memory_space=pltpu.VMEM)
    s = scale[None].astype(jnp.float32)
    bb = bias[None].astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_conv_kernel, width=w_, cin=cin, cout=cout,
                          relu=relu),
        grid=grid,
        in_specs=[xspec, xspec, xspec, full(w), full(s), full(bb)],
        out_specs=pl.BlockSpec((1, row_tile, w_, cout),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h_pad, w_, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * w_ * 9 * cin * cout,
            bytes_accessed=4 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(*views, w, s, bb)
    return out[:, :h]


def double_conv_infer(x, w1, scale1, bias1, w2, scale2, bias2,
                      row_tile: int = 25):
    """DoubleConv (conv3×3→BN→ReLU ×2) via two fused conv kernels."""
    mid = conv3x3_infer(x, w1, scale1, bias1, row_tile=row_tile)
    return conv3x3_infer(mid, w2, scale2, bias2, row_tile=row_tile)
