"""Fused 3×3 conv (+scale/bias+ReLU) Pallas kernel in haloed HCW layout.

Second-generation U-Net conv kernel (the first, conv_block.py, kept the
NHWC layout and lost to XLA: its dx taps were sublane-dim slices, each a
Mosaic relayout).  This kernel lays activations out as **[B, H, C, W]** —
width in lanes, channels in sublanes — so the 3×3 conv's structure maps
directly onto the hardware:

- dy taps are row offsets, folded into the contraction: each output row
  group contracts a ``(P+2)·Cin``-long K dimension over its 3-row input
  window, read as one aligned sublane slice;
- dx taps are *lane* rolls, materialized once per tile into an
  interleaved (window row, shift, ci) VMEM scratch so each output group
  is a SINGLE [M, (P+2)·3·Cin] MXU contraction;
- the MXU output dimension is ``P·Cout`` with ``P = 128 // Cout`` rows per
  group — **full 128 output lanes even for Cout=64**, where plain XLA
  NHWC convs idle half the MXU.  The banded (dy ∈ {-1,0,1}) weight
  stacking is 75 % dense at P=2 and 100 % at P=1, against a 2×-wider MXU.

I/O design (what killed the first draft of this kernel: XLA materialized
two row-shifted copies of the input, ~3 GB of extra HBM traffic at 500²):

- activations travel between layers in **haloed** form
  ``[B, Hp+2, C, Wp]`` — one zero row above, ``Hp-H+1`` zero rows below,
  zero lanes beyond W — so a row tile's input window ``[i·R, i·R+R+2)``
  starts on an R-row boundary;
- the same haloed array is passed to ``pallas_call`` **twice**: once with
  R-row blocks and once with 2-row blocks picking up the window's tail —
  two auto-pipelined streams over one HBM buffer, no copies;
- the output (also haloed) is written by **manual async DMA** at the +1
  row offset BlockSpecs cannot express, double-buffered across grid
  steps; the kernel's row/lane masks re-establish the zero-halo invariant
  (bottom pad rows compute to relu(bias) otherwise), and the first/last
  programs DMA the single top/bottom halo rows from a zeroed scratch.

The per-channel scale/bias epilogue folds the inference BatchNorm
(conv_block.fold_bn) and the ReLU, so a U-Net DoubleConv is two kernel
launches and nothing else.  Used by unet_light.apply_infer_hcw
(reference cost center: 500² SimpleUnetLight,
src/face_simple/models/SimpleUnetLight.py:82-111).

Measured on v5e (batch 16, bf16): **2.0× XLA on the 500²×64→64 layers**
(3.9 vs 7.6 ms) and parity-to-1.3× on the other U-Net shapes — but the
composed U-Net still trails XLA's (47 vs 39 ms) because XLA absorbs the
pool/upsample/concat glue into its conv fusions for free while this path
pays ~12 ms for explicit glue.  Kept as an opt-in (apply_infer_hcw) until
the glue is fused into the kernels; see TODO.md for the full analysis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# v5e physically carries far more VMEM than the 16 MB default scoped
# limit (96 MB scratch allocations compile and run); raising the limit
# lets the fused blocks use taller row tiles and larger shapes
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


def halo_pad(x, row_tile: int = 16):
    """[B, H, C, W] -> haloed [B, Hp+2, C, Wp] with the zero-row/zero-lane
    invariant conv3x3_hcw expects (Hp = H rounded up to row_tile, Wp = W
    rounded up to 128 with at least one zero lane)."""
    b, h, c, w = x.shape
    wp = -(-w // 128) * 128
    if wp == w:
        wp += 128
    hp = -(-h // row_tile) * row_tile
    return jnp.pad(x, ((0, 0), (1, hp - h + 1), (0, 0), (0, wp - w)))



def _dot(a, b):
    """MXU dot with full f32 precision when the inputs are f32 (Mosaic's
    default lowers f32 contractions through single-pass bf16, which costs
    ~2^-8 relative error — fine for the bf16 serving path, wrong for the
    f32 parity/selection paths), default (fast) precision otherwise."""
    prec = (jax.lax.Precision.HIGHEST if a.dtype == jnp.float32
            else None)
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=prec)


def _pack_weights(w, p: int):
    """w: [3, 3, Cin, Cout] -> lhs [M=P*Cout, K=(P+2)*3*Cin] with
    lhs[r*Cout+co, (j*3+dx)*Cin+ci] = w[j-r, dx, ci, co] for 0<=j-r<=2 —
    the K order matches the kernel's (window row, dx-shift, ci)
    interleaved scratch."""
    cin, cout = w.shape[2], w.shape[3]
    zero = jnp.zeros((cout, cin), w.dtype)
    rows = []
    for r in range(p):
        blocks = [w[j - r, dx].T if 0 <= j - r <= 2 else zero
                  for j in range(p + 2) for dx in range(3)]
        rows.append(jnp.concatenate(blocks, axis=1))
    return jnp.concatenate(rows, axis=0)


def _conv_kernel(xa_ref, xb_ref, lhs_ref, sb_ref, out_ref,
                 oscr_ref, sxi_ref, zrow_ref, sems, *,
                 rows: int, h_valid: int, w_valid: int, cin: int,
                 cout: int, p: int, relu: bool):
    """One (batch, row-tile) program; output via manual double-buffered
    DMA into the haloed out array (ANY memspace).

    xa_ref: [1, rows, cin, wp]   input buffer rows [i*R, i*R+R)
    xb_ref: [1, 2, cin, wp]      input buffer rows [i*R+R, i*R+R+2)
    lhs_ref: [P*cout, (P+2)*3*cin] packed weights
    sb_ref: [2, P*cout, 1] scale/bias rows (tiled over P)
    out_ref: [B, Hp+2, cout, wp] in ANY/HBM
    oscr_ref: [2, rows, cout, wp] VMEM out staging
    sxi_ref: [rows+2, 3, cin, wp] VMEM interleaved shift scratch
    zrow_ref: [1, cout, wp] VMEM zero slab for the halo rows
    sems: DMA semaphores [3]
    """
    wp = out_ref.shape[-1]
    k = (p + 2) * 3 * cin
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    t = b * nb + i
    slot = jax.lax.rem(t, 2)

    scale = sb_ref[0]
    bias = sb_ref[1]
    m = p * cout
    sub_row = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) // cout
    lane_ok = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1) < w_valid

    # wait for the DMA that used this slot two programs ago
    @pl.when(t >= 2)
    def _():
        pltpu.make_async_copy(
            oscr_ref.at[slot],
            out_ref.at[b, pl.ds(1 + i * rows, rows)],
            sems.at[slot]).wait()

    # build the interleaved (window row, dx-shift, ci) scratch; see
    # _build_sxi for the roll/wrap-junk discussion
    def read_in(c0, c1):
        if c1 <= rows:
            return xa_ref[0, c0:c1]                    # [c, cin, wp]
        return jnp.stack([xa_ref[0, j] if j < rows
                          else xb_ref[0, j - rows]
                          for j in range(c0, c1)])

    _build_sxi(sxi_ref, read_in, rows + 2, cin, wp)

    sxi = sxi_ref[...].reshape((rows + 2) * 3 * cin, wp)
    for g in range(rows // p):
        rhs = sxi[g * p * 3 * cin:g * p * 3 * cin + k]
        acc = _dot(lhs_ref[...], rhs)
        acc = acc * scale + bias
        if relu:
            acc = jnp.maximum(acc, 0.0)
        row_ok = (i * rows + g * p + sub_row) < h_valid
        acc = jnp.where(jnp.logical_and(row_ok, lane_ok), acc, 0.0)
        oscr_ref[slot, g * p:(g + 1) * p] = acc.reshape(
            p, cout, wp).astype(oscr_ref.dtype)

    out_dma = pltpu.make_async_copy(
        oscr_ref.at[slot],
        out_ref.at[b, pl.ds(1 + i * rows, rows)],
        sems.at[slot])
    out_dma.start()

    # halo rows: first program of each batch writes the zero top row,
    # last one the zero bottom row (synchronously - they are tiny)
    @pl.when(t == 0)
    def _():
        zrow_ref[...] = jnp.zeros_like(zrow_ref)

    @pl.when(i == 0)
    def _():
        dma = pltpu.make_async_copy(zrow_ref,
                                    out_ref.at[b, pl.ds(0, 1)], sems.at[2])
        dma.start()
        dma.wait()

    @pl.when(i == nb - 1)
    def _():
        dma = pltpu.make_async_copy(
            zrow_ref, out_ref.at[b, pl.ds(1 + nb * rows, 1)], sems.at[2])
        dma.start()
        dma.wait()
        # drain the double buffer at the very end
        @pl.when(b == pl.num_programs(0) - 1)
        def _():
            out_dma.wait()

            @pl.when(t >= 1)
            def _():
                pltpu.make_async_copy(
                    oscr_ref.at[1 - slot],
                    out_ref.at[b, pl.ds(1 + i * rows, rows)],
                    sems.at[1 - slot]).wait()


@functools.partial(jax.jit,
                   static_argnames=("h", "w_valid", "row_tile", "relu",
                                    "out_dtype"))
def conv3x3_hcw(xh, w, scale, bias, h: int, w_valid: int,
                row_tile: int = 16, relu: bool = True, out_dtype=None):
    """Fused conv3×3 (padding 1) + per-channel scale/bias + optional ReLU
    on a haloed HCW activation (see halo_pad).

    xh: [B, Hp+2, Cin, Wp] haloed input (zero top/bottom rows and >=1 zero
    lane — the invariant every conv3x3_hcw output re-establishes);
    w: [3, 3, Cin, Cout]; scale/bias: [Cout]; h/w_valid: the true data
    height/width (rows [1, 1+h), lanes [0, w_valid) of the buffer hold
    data; everything else is zero and the kernel's masks keep it so).
    Returns the haloed output [B, Hp+2, Cout, Wp].  Cin must be a
    multiple of 16, Cout in {64, 128, 256}.
    """
    bsz, hp2, cin, wp = xh.shape
    hp = hp2 - 2
    cout = w.shape[-1]
    assert cin % 16 == 0 and cout in (64, 128, 256), (cin, cout)
    assert hp % row_tile == 0 and wp % 128 == 0
    assert h <= hp and w_valid < wp
    p = max(1, 128 // cout)
    assert row_tile % p == 0
    out_dtype = out_dtype or xh.dtype

    lhs = _pack_weights(w, p).astype(xh.dtype)
    sb = jnp.stack([jnp.tile(scale.astype(jnp.float32), p),
                    jnp.tile(bias.astype(jnp.float32), p)])[..., None]

    nb = hp // row_tile
    grid = (bsz, nb)
    xa_spec = pl.BlockSpec((1, row_tile, cin, wp),
                           lambda b, i: (b, i, 0, 0),
                           memory_space=pltpu.VMEM)
    xb_spec = pl.BlockSpec((1, 2, cin, wp),
                           lambda b, i: (b, i * (row_tile // 2)
                                         + row_tile // 2, 0, 0),
                           memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda b, i: tuple(0 for _ in arr.shape),
        memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_conv_kernel, rows=row_tile, h_valid=h,
                          w_valid=w_valid, cin=cin, cout=cout, p=p,
                          relu=relu),
        grid=grid,
        in_specs=[xa_spec, xb_spec, full(lhs), full(sb)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((bsz, hp2, cout, wp), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, row_tile, cout, wp), out_dtype),
            pltpu.VMEM((row_tile + 2, 3, cin, wp), xh.dtype),
            pltpu.VMEM((1, cout, wp), out_dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * hp * wp * 9 * cin * cout,
            bytes_accessed=(xh.size + bsz * hp2 * cout * wp)
            * xh.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=_VMEM_LIMIT,
    )(xh, xh, lhs, sb)
    return out


# ---------------------------------------------------------------------------
# Pair-fused DoubleConv (conv1 -> BN/ReLU -> conv2 -> BN/ReLU in one kernel)
# ---------------------------------------------------------------------------

def halo2_pad(x, row_tile: int = 8):
    """[B, H, C, W] -> double-haloed [B, Hp+4, C, Wp]: two zero rows above
    (a fused conv pair consumes a 2-row halo), >=2 below, zero pad lanes."""
    b, h, c, w = x.shape
    wp = -(-w // 128) * 128
    if wp == w:
        wp += 128
    hp = -(-h // row_tile) * row_tile
    return jnp.pad(x, ((0, 0), (2, hp - h + 2), (0, 0), (0, wp - w)))


def _build_sxi(sxi_ref, read_row, n_rows: int, cin: int, wp: int,
               chunk: int = 4):
    """Fill sxi_ref [n_rows, 3, cin, wp] with the (row, dx-shift, ci)
    interleave: shift 1 raw, shifts 0/2 lane-rolled (``pltpu.roll`` is
    32-bit only, so rolls round-trip through fp32; wrap junk lands in the
    zero pad column / masked output lanes).
    ``read_row(c0, c1) -> [c1-c0, cin, wp]``."""
    _build_sxi_at(sxi_ref, read_row, n_rows, cin, wp, 0, chunk)


def _dconv_kernel(xa_ref, xb_ref, lhs1_ref, lhs2_ref, sb_ref, out_ref,
                  oscr_ref, sxi1_ref, mid_ref, sxi2_ref, zrow_ref, sems, *,
                  rows: int, h_valid: int, w_valid: int, cin: int,
                  cmid: int, cout: int, p1: int, p2: int):
    """One (batch, row-tile) program of the fused DoubleConv.

    xa_ref: [1, rows, cin, wp]  buffer rows [i*R, i*R+R)
    xb_ref: [1, 4, cin, wp]     buffer rows [i*R+R, i*R+R+4)
    lhs1/lhs2: packed weights for conv1/conv2
    sb_ref: [4, max(P*C), 1] scale/bias rows for both convs
    out_ref: [B, Hp+4, cout, wp] (ANY)
    mid_ref: [rows+2, cmid, wp] conv1 output scratch
    """
    wp = out_ref.shape[-1]
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    t = b * nb + i
    slot = jax.lax.rem(t, 2)
    lane_ok = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1) < w_valid

    @pl.when(t >= 2)
    def _():
        pltpu.make_async_copy(
            oscr_ref.at[slot],
            out_ref.at[b, pl.ds(2 + i * rows, rows)],
            sems.at[slot]).wait()

    def read_in(c0, c1):
        if c1 <= rows:
            return xa_ref[0, c0:c1]
        parts = [xa_ref[0, j] if j < rows else xb_ref[0, j - rows]
                 for j in range(c0, c1)]
        return jnp.stack(parts)

    _build_sxi(sxi1_ref, read_in, rows + 4, cin, wp)
    sxi1 = sxi1_ref[...].reshape((rows + 4) * 3 * cin, wp)
    k1 = (p1 + 2) * 3 * cin
    m1 = p1 * cmid
    sub1 = jax.lax.broadcasted_iota(jnp.int32, (m1, 1), 0) // cmid
    scale1, bias1 = sb_ref[0, :m1], sb_ref[1, :m1]
    # conv1 output rows: data rows [i*R-1, i*R+R+1)
    for g in range((rows + 2) // p1):
        rhs = sxi1[g * p1 * 3 * cin:g * p1 * 3 * cin + k1]
        acc = _dot(lhs1_ref[...], rhs)
        acc = jnp.maximum(acc * scale1 + bias1, 0.0)
        data_row = i * rows - 1 + g * p1 + sub1
        ok = jnp.logical_and(data_row >= 0, data_row < h_valid)
        acc = jnp.where(jnp.logical_and(ok, lane_ok), acc, 0.0)
        mid_ref[g * p1:(g + 1) * p1] = acc.reshape(
            p1, cmid, wp).astype(mid_ref.dtype)

    _build_sxi(sxi2_ref, lambda c0, c1: mid_ref[c0:c1], rows + 2, cmid, wp)
    sxi2 = sxi2_ref[...].reshape((rows + 2) * 3 * cmid, wp)
    k2 = (p2 + 2) * 3 * cmid
    m2 = p2 * cout
    sub2 = jax.lax.broadcasted_iota(jnp.int32, (m2, 1), 0) // cout
    scale2, bias2 = sb_ref[2, :m2], sb_ref[3, :m2]
    for g in range(rows // p2):
        rhs = sxi2[g * p2 * 3 * cmid:g * p2 * 3 * cmid + k2]
        acc = _dot(lhs2_ref[...], rhs)
        acc = jnp.maximum(acc * scale2 + bias2, 0.0)
        row_ok = (i * rows + g * p2 + sub2) < h_valid
        acc = jnp.where(jnp.logical_and(row_ok, lane_ok), acc, 0.0)
        oscr_ref[slot, g * p2:(g + 1) * p2] = acc.reshape(
            p2, cout, wp).astype(oscr_ref.dtype)

    out_dma = pltpu.make_async_copy(
        oscr_ref.at[slot],
        out_ref.at[b, pl.ds(2 + i * rows, rows)],
        sems.at[slot])
    out_dma.start()

    @pl.when(t == 0)
    def _():
        zrow_ref[...] = jnp.zeros_like(zrow_ref)

    @pl.when(i == 0)
    def _():
        dma = pltpu.make_async_copy(zrow_ref,
                                    out_ref.at[b, pl.ds(0, 2)], sems.at[2])
        dma.start()
        dma.wait()

    @pl.when(i == nb - 1)
    def _():
        dma = pltpu.make_async_copy(
            zrow_ref, out_ref.at[b, pl.ds(2 + nb * rows, 2)], sems.at[2])
        dma.start()
        dma.wait()

        @pl.when(b == pl.num_programs(0) - 1)
        def _():
            out_dma.wait()

            @pl.when(t >= 1)
            def _():
                pltpu.make_async_copy(
                    oscr_ref.at[1 - slot],
                    out_ref.at[b, pl.ds(2 + i * rows, rows)],
                    sems.at[1 - slot]).wait()


@functools.partial(jax.jit,
                   static_argnames=("h", "w_valid", "row_tile",
                                    "out_dtype"))
def double_conv_hcw(xh, w1, scale1, bias1, w2, scale2, bias2, h: int,
                    w_valid: int, row_tile: int = 8, out_dtype=None):
    """Fused DoubleConv (conv3×3+BN+ReLU ×2) on a double-haloed HCW
    activation (see halo2_pad): the conv1 intermediate never leaves VMEM.

    xh: [B, Hp+4, Cin, Wp]; w1: [3,3,Cin,Cmid]; w2: [3,3,Cmid,Cout].
    Returns the double-haloed output [B, Hp+4, Cout, Wp]."""
    bsz, hp4, cin, wp = xh.shape
    hp = hp4 - 4
    cmid, cout = w1.shape[-1], w2.shape[-1]
    assert w2.shape[2] == cmid and cin % 16 == 0
    assert hp % row_tile == 0 and row_tile % 4 == 0
    assert h <= hp and w_valid < wp
    p1 = max(1, 128 // cmid)
    p2 = max(1, 128 // cout)
    assert (row_tile + 2) % p1 == 0 and row_tile % p2 == 0
    out_dtype = out_dtype or xh.dtype

    lhs1 = _pack_weights(w1, p1).astype(xh.dtype)
    lhs2 = _pack_weights(w2, p2).astype(xh.dtype)
    mrow = max(p1 * cmid, p2 * cout)
    sb = jnp.zeros((4, mrow), jnp.float32)
    sb = sb.at[0, :p1 * cmid].set(jnp.tile(scale1.astype(jnp.float32), p1))
    sb = sb.at[1, :p1 * cmid].set(jnp.tile(bias1.astype(jnp.float32), p1))
    sb = sb.at[2, :p2 * cout].set(jnp.tile(scale2.astype(jnp.float32), p2))
    sb = sb.at[3, :p2 * cout].set(jnp.tile(bias2.astype(jnp.float32), p2))
    sb = sb[..., None]

    nb = hp // row_tile
    xa_spec = pl.BlockSpec((1, row_tile, cin, wp),
                           lambda b, i: (b, i, 0, 0),
                           memory_space=pltpu.VMEM)
    xb_spec = pl.BlockSpec((1, 4, cin, wp),
                           lambda b, i: (b, i * (row_tile // 4)
                                         + row_tile // 4, 0, 0),
                           memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda b, i: tuple(0 for _ in arr.shape),
        memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_dconv_kernel, rows=row_tile, h_valid=h,
                          w_valid=w_valid, cin=cin, cmid=cmid, cout=cout,
                          p1=p1, p2=p2),
        grid=(bsz, nb),
        in_specs=[xa_spec, xb_spec, full(lhs1), full(lhs2), full(sb)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((bsz, hp4, cout, wp), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, row_tile, cout, wp), out_dtype),
            pltpu.VMEM((row_tile + 4, 3, cin, wp), xh.dtype),
            pltpu.VMEM((row_tile + 2, cmid, wp), xh.dtype),
            pltpu.VMEM((row_tile + 2, 3, cmid, wp), xh.dtype),
            pltpu.VMEM((2, cout, wp), out_dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * hp * wp * 9 * (cin * cmid + cmid * cout),
            bytes_accessed=(xh.size + bsz * hp4 * cout * wp)
            * xh.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=_VMEM_LIMIT,
    )(xh, xh, lhs1, lhs2, sb)
    return out


# ---------------------------------------------------------------------------
# Fully-fused U-Net block: [upsample2x +] concat + DoubleConv [+ maxpool]
# ---------------------------------------------------------------------------

def _up_tvec(h_out: int, hp: int):
    """Interpolation weight per output row for exact-2x align-corners
    upsampling: t[r] such that up[r] = (1-t)*low[lo(r)] + t*low[lo(r)+1]
    with lo(2k)=k-1, lo(2k+1)=k (the closed form the shifted-slice
    upsampler uses; boundary rows self-correct through t=1/t=0 against
    the low buffer's zero halo rows).  Indexed at r+2 (window coords)."""
    import numpy as np
    h_lo = h_out // 2
    r = np.arange(h_out)
    k = (r - (r & 1)) // 2
    pos = r * (h_lo - 1) / (h_out - 1)
    lo = np.where(r & 1, k, k - 1)
    t = (pos - lo).astype(np.float32)
    out = np.zeros(hp + 4, np.float32)
    out[2:2 + h_out] = t
    return jnp.asarray(out)[:, None]


def _make_fused_kernel(descs, rows, h_valid, w_valid, cmid, cout, p1, p2,
                       pool):
    n_ops = sum(2 if d[0] == "direct" else 4 for d in descs) + 3 + \
        (2 if pool else 0)

    def kernel(*refs):
        srcs = []
        pos = 0
        for d in descs:
            if d[0] == "direct":
                srcs.append(("direct", refs[pos], refs[pos + 1], d[1]))
                pos += 2
            else:
                srcs.append(("up2x", refs[pos], refs[pos + 1],
                             refs[pos + 2], refs[pos + 3], d[1]))
                pos += 4
        lhs1_ref, lhs2_ref, sb_ref = refs[pos:pos + 3]
        pos += 3
        if pool:
            sele_ref, selo_ref = refs[pos:pos + 2]
            pos += 2
        out_ref = refs[pos]
        pos += 1
        if pool:
            out2_ref = refs[pos]
            pos += 1
        oscr_ref, sxi1_ref, mid_ref, sxi2_ref, zrow_ref = \
            refs[pos:pos + 5]
        pos += 5
        if pool:
            oscr2_ref, zrow2_ref = refs[pos:pos + 2]
            pos += 2
        sems = refs[pos]

        wp = out_ref.shape[-1]
        b = pl.program_id(0)
        i = pl.program_id(1)
        nb = pl.num_programs(1)
        t = b * nb + i
        slot = jax.lax.rem(t, 2)
        lane_ok = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1) < w_valid

        @pl.when(t >= 2)
        def _():
            pltpu.make_async_copy(
                oscr_ref.at[slot],
                out_ref.at[b, pl.ds(2 + i * rows, rows)],
                sems.at[slot]).wait()
            if pool:
                pltpu.make_async_copy(
                    oscr2_ref.at[slot],
                    out2_ref.at[b, pl.ds(2 + i * (rows // 2), rows // 2)],
                    sems.at[3 + slot]).wait()

        # ---- build the concatenated input interleave ----
        ci_off = 0
        for s in srcs:
            if s[0] == "direct":
                _, xa_ref, xb_ref, cl = s

                def read_direct(c0, c1, xa_ref=xa_ref, xb_ref=xb_ref):
                    if c1 <= rows:
                        return xa_ref[0, c0:c1]
                    parts = [xa_ref[0, j] if j < rows
                             else xb_ref[0, j - rows]
                             for j in range(c0, c1)]
                    return jnp.stack(parts)

                _build_sxi_at(sxi1_ref, read_direct, rows + 4, cl, wp,
                              ci_off)
            else:
                _, la_ref, lb_ref, mw_ref, tv_ref, cl = s
                half = rows // 2

                def read_up(c0, c1, la_ref=la_ref, lb_ref=lb_ref,
                            mw_ref=mw_ref, tv_ref=tv_ref, cl=cl,
                            half=half):
                    urows = []
                    for j in range(c0, c1):
                        par = j & 1
                        l0 = (j - 2 - par) // 2 + par + 1
                        low0 = (la_ref[0, l0] if l0 < half
                                else lb_ref[0, l0 - half])
                        low1 = (la_ref[0, l0 + 1] if l0 + 1 < half
                                else lb_ref[0, l0 + 1 - half])
                        tj = tv_ref[i * rows + j, 0]
                        r_out = i * rows - 2 + j
                        valid = jnp.where(
                            jnp.logical_and(r_out >= 0, r_out < h_valid),
                            1.0, 0.0)
                        urows.append((low0.astype(jnp.float32) * (1 - tj)
                                      + low1.astype(jnp.float32) * tj)
                                     * valid)
                    u = jnp.concatenate(urows, axis=0)   # [c*cl, wpl]
                    u = _dot(u.astype(sxi1_ref.dtype), mw_ref[...])
                    return u.astype(sxi1_ref.dtype).reshape(
                        c1 - c0, cl, wp)

                _build_sxi_at(sxi1_ref, read_up, rows + 4, cl, wp, ci_off)
            ci_off += s[-1]
        cin = ci_off

        sxi1 = sxi1_ref[...].reshape((rows + 4) * 3 * cin, wp)
        k1 = (p1 + 2) * 3 * cin
        m1 = p1 * cmid
        sub1 = jax.lax.broadcasted_iota(jnp.int32, (m1, 1), 0) // cmid
        scale1, bias1 = sb_ref[0, :m1], sb_ref[1, :m1]
        for g in range((rows + 2) // p1):
            rhs = sxi1[g * p1 * 3 * cin:g * p1 * 3 * cin + k1]
            acc = _dot(lhs1_ref[...], rhs)
            acc = jnp.maximum(acc * scale1 + bias1, 0.0)
            data_row = i * rows - 1 + g * p1 + sub1
            ok = jnp.logical_and(data_row >= 0, data_row < h_valid)
            acc = jnp.where(jnp.logical_and(ok, lane_ok), acc, 0.0)
            mid_ref[g * p1:(g + 1) * p1] = acc.reshape(
                p1, cmid, wp).astype(mid_ref.dtype)

        _build_sxi_at(sxi2_ref, lambda c0, c1: mid_ref[c0:c1], rows + 2,
                      cmid, wp, 0)
        sxi2 = sxi2_ref[...].reshape((rows + 2) * 3 * cmid, wp)
        k2 = (p2 + 2) * 3 * cmid
        m2 = p2 * cout
        sub2 = jax.lax.broadcasted_iota(jnp.int32, (m2, 1), 0) // cout
        scale2, bias2 = sb_ref[2, :m2], sb_ref[3, :m2]
        prev = None
        for g in range(rows // p2):
            rhs = sxi2[g * p2 * 3 * cmid:g * p2 * 3 * cmid + k2]
            acc = _dot(lhs2_ref[...], rhs)
            acc = jnp.maximum(acc * scale2 + bias2, 0.0)
            row_ok = (i * rows + g * p2 + sub2) < h_valid
            acc = jnp.where(jnp.logical_and(row_ok, lane_ok), acc, 0.0)
            oscr_ref[slot, g * p2:(g + 1) * p2] = acc.reshape(
                p2, cout, wp).astype(oscr_ref.dtype)
            if pool:
                # pooled row per 2 output rows: row-pair max, then lane
                # pairs selected by two one-hot matmuls (post-ReLU values
                # are >=0, so the zero pad never wins a max)
                if p2 == 2:
                    rmax = jnp.maximum(acc[:cout], acc[cout:])
                elif g % 2 == 0:
                    prev = acc
                    rmax = None
                else:
                    rmax = jnp.maximum(prev, acc)
                if rmax is not None:
                    rmax = rmax.astype(oscr2_ref.dtype)
                    pooled = jnp.maximum(_dot(rmax, sele_ref[...]),
                                          _dot(rmax, selo_ref[...]))
                    pi = (g * p2) // 2
                    oscr2_ref[slot, pi] = pooled.astype(oscr2_ref.dtype)

        out_dma = pltpu.make_async_copy(
            oscr_ref.at[slot],
            out_ref.at[b, pl.ds(2 + i * rows, rows)],
            sems.at[slot])
        out_dma.start()
        if pool:
            pool_dma = pltpu.make_async_copy(
                oscr2_ref.at[slot],
                out2_ref.at[b, pl.ds(2 + i * (rows // 2), rows // 2)],
                sems.at[3 + slot])
            pool_dma.start()

        @pl.when(t == 0)
        def _():
            zrow_ref[...] = jnp.zeros_like(zrow_ref)
            if pool:
                zrow2_ref[...] = jnp.zeros_like(zrow2_ref)

        @pl.when(i == 0)
        def _():
            dma = pltpu.make_async_copy(
                zrow_ref, out_ref.at[b, pl.ds(0, 2)], sems.at[2])
            dma.start()
            dma.wait()
            if pool:
                dma2 = pltpu.make_async_copy(
                    zrow2_ref, out2_ref.at[b, pl.ds(0, 2)], sems.at[2])
                dma2.start()
                dma2.wait()

        @pl.when(i == nb - 1)
        def _():
            dma = pltpu.make_async_copy(
                zrow_ref, out_ref.at[b, pl.ds(2 + nb * rows, 2)],
                sems.at[2])
            dma.start()
            dma.wait()
            if pool:
                dma2 = pltpu.make_async_copy(
                    zrow2_ref,
                    out2_ref.at[b, pl.ds(2 + nb * (rows // 2), 2)],
                    sems.at[2])
                dma2.start()
                dma2.wait()

            @pl.when(b == pl.num_programs(0) - 1)
            def _():
                out_dma.wait()
                if pool:
                    pool_dma.wait()

                @pl.when(t >= 1)
                def _():
                    pltpu.make_async_copy(
                        oscr_ref.at[1 - slot],
                        out_ref.at[b, pl.ds(2 + i * rows, rows)],
                        sems.at[1 - slot]).wait()
                    if pool:
                        pltpu.make_async_copy(
                            oscr2_ref.at[1 - slot],
                            out2_ref.at[b, pl.ds(2 + i * (rows // 2),
                                                 rows // 2)],
                            sems.at[3 + (1 - slot)]).wait()

    return kernel, n_ops


def _build_sxi_at(sxi_ref, read_row, n_rows: int, cl: int, wp: int,
                  ci_off: int, chunk: int = 4):
    """_build_sxi into a channel sub-range [ci_off, ci_off+cl) of a
    concatenated interleave scratch."""
    for c0 in range(0, n_rows, chunk):
        c1 = min(c0 + chunk, n_rows)
        src = read_row(c0, c1)
        c = c1 - c0
        f = src.astype(jnp.float32).reshape(c * cl, wp)
        rm = pltpu.roll(f, 1, 1).astype(src.dtype).reshape(c, cl, wp)
        rp = pltpu.roll(f, wp - 1, 1).astype(src.dtype).reshape(c, cl, wp)
        sxi_ref[pl.ds(c0, c), 0, ci_off:ci_off + cl] = rm
        sxi_ref[pl.ds(c0, c), 1, ci_off:ci_off + cl] = src
        sxi_ref[pl.ds(c0, c), 2, ci_off:ci_off + cl] = rp


@functools.partial(jax.jit,
                   static_argnames=("h", "w_valid", "row_tile", "pool_out",
                                    "out_dtype", "src_kinds"))
def _fused_block_impl(arrays, w1, scale1, bias1, w2, scale2, bias2,
                      h: int, w_valid: int, row_tile: int, pool_out: bool,
                      out_dtype, src_kinds):
    """See fused_block_hcw.  ``arrays``: flat tuple of source buffers;
    ``src_kinds``: matching tuple of 'direct' | 'up2x'."""
    bsz = arrays[0].shape[0]
    assert "direct" in src_kinds, \
        "fused_block_hcw needs at least one full-resolution source " \
        "(it defines the output geometry)"
    hp = wp = None
    for kind, a in zip(src_kinds, arrays):
        if kind == "direct":
            hp = a.shape[1] - 4
            wp = a.shape[-1]
    cmid, cout = w1.shape[-1], w2.shape[-1]
    p1 = max(1, 128 // cmid)
    p2 = max(1, 128 // cout)
    assert w_valid < wp and h <= hp
    assert hp % row_tile == 0 and row_tile % 4 == 0
    assert (row_tile + 2) % p1 == 0 and row_tile % p2 == 0
    if any(k == "up2x" for k in src_kinds):
        assert row_tile % 8 == 0
    out_dtype = out_dtype or arrays[0].dtype
    dt = arrays[0].dtype

    descs = []
    ops = []
    nb = hp // row_tile
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda b, i: tuple(0 for _ in arr.shape),
        memory_space=pltpu.VMEM)
    in_specs = []
    cin = 0
    for kind, a in zip(src_kinds, arrays):
        cl = a.shape[2]
        cin += cl
        if kind == "direct":
            descs.append(("direct", cl))
            in_specs += [
                pl.BlockSpec((1, row_tile, cl, wp),
                             lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4, cl, wp),
                             lambda b, i, rt=row_tile:
                             (b, i * (rt // 4) + rt // 4, 0, 0),
                             memory_space=pltpu.VMEM)]
            ops += [a, a]
        else:
            wpl = a.shape[-1]
            w_lo = w_valid // 2
            descs.append(("up2x", cl))
            mw = snn_align_matrix(w_valid, w_lo, dt, wpl, wp)
            tv = _up_tvec(h, hp)
            in_specs += [
                pl.BlockSpec((1, row_tile // 2, cl, wpl),
                             lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4, cl, wpl),
                             lambda b, i, rt=row_tile:
                             (b, i * (rt // 8) + rt // 8, 0, 0),
                             memory_space=pltpu.VMEM),
                full(mw), full(tv)]
            ops += [a, a, mw, tv]

    lhs1 = _pack_weights(w1, p1).astype(dt)
    lhs2 = _pack_weights(w2, p2).astype(dt)
    mrow = max(p1 * cmid, p2 * cout)
    sb = jnp.zeros((4, mrow), jnp.float32)
    sb = sb.at[0, :p1 * cmid].set(jnp.tile(scale1.astype(jnp.float32), p1))
    sb = sb.at[1, :p1 * cmid].set(jnp.tile(bias1.astype(jnp.float32), p1))
    sb = sb.at[2, :p2 * cout].set(jnp.tile(scale2.astype(jnp.float32), p2))
    sb = sb.at[3, :p2 * cout].set(jnp.tile(bias2.astype(jnp.float32), p2))
    sb = sb[..., None]
    in_specs += [full(lhs1), full(lhs2), full(sb)]
    ops += [lhs1, lhs2, sb]

    wp2 = 0
    if pool_out:
        w_pool = w_valid // 2
        wp2 = -(-w_pool // 128) * 128
        if wp2 == w_pool:
            wp2 += 128
        cols = jnp.arange(wp)[:, None]
        outs_i = jnp.arange(wp2)[None, :]
        sel_e = (cols == 2 * outs_i).astype(dt)
        sel_o = (cols == 2 * outs_i + 1).astype(dt)
        in_specs += [full(sel_e), full(sel_o)]
        ops += [sel_e, sel_o]

    kernel, _ = _make_fused_kernel(descs, row_tile, h, w_valid, cmid, cout,
                                   p1, p2, pool_out)

    out_shapes = [jax.ShapeDtypeStruct((bsz, hp + 4, cout, wp), out_dtype)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
    if pool_out:
        out_shapes.append(jax.ShapeDtypeStruct(
            (bsz, hp // 2 + 4, cout, wp2), out_dtype))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))

    scratch = [
        pltpu.VMEM((2, row_tile, cout, wp), out_dtype),
        pltpu.VMEM((row_tile + 4, 3, cin, wp), dt),
        pltpu.VMEM((row_tile + 2, cmid, wp), dt),
        pltpu.VMEM((row_tile + 2, 3, cmid, wp), dt),
        pltpu.VMEM((2, cout, wp), out_dtype),
    ]
    if pool_out:
        scratch += [pltpu.VMEM((2, row_tile // 2, cout, wp2), out_dtype),
                    pltpu.VMEM((2, cout, wp2), out_dtype)]
    scratch.append(pltpu.SemaphoreType.DMA((5,)))

    res = pl.pallas_call(
        kernel,
        grid=(bsz, nb),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if pool_out else out_specs[0],
        out_shape=tuple(out_shapes) if pool_out else out_shapes[0],
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * hp * wp * 9 * (cin * cmid + cmid * cout),
            bytes_accessed=sum(a.size * a.dtype.itemsize for a in arrays)
            + bsz * (hp + 4) * cout * wp * 2,
            transcendentals=0,
        ),
        compiler_params=_VMEM_LIMIT,
    )(*ops)
    return res


def snn_align_matrix(out_w, in_w, dtype, wpl, wp):
    """[wpl, wp] width-upsample matrix: align-corners interpolation from
    in_w columns to out_w, zero-padded to the padded lane widths."""
    from speech2lip_tpu.ops import nn as snn
    m = snn._align_corners_matrix(out_w, in_w, jnp.float32).T  # [in, out]
    m = jnp.pad(m, ((0, wpl - in_w), (0, wp - out_w)))
    return m.astype(dtype)


def fused_block_hcw(sources, w1, scale1, bias1, w2, scale2, bias2, h: int,
                    w_valid: int, row_tile: int = 8, pool_out: bool = False,
                    out_dtype=None):
    """One fused U-Net block: [2x-upsample +] channel-concat of the
    sources + DoubleConv (conv3x3+BN+ReLU twice) [+ 2x2 maxpool output].

    sources: list of ('direct', xh) with xh double-haloed [B, Hp+4, C, Wp]
    at full resolution, or ('up2x', xlo) with xlo double-haloed at half
    resolution — upsampled bilinearly (align-corners, exact-2x closed
    form) inside the kernel's scratch build, so neither the upsampled
    tensor nor the concatenation ever exists in HBM.  Channel order in
    w1's input dim follows the source order.

    Returns the double-haloed output, or (out, pooled_out) when
    ``pool_out`` (row-pair max + one-hot lane-pair matmuls fused into the
    conv2 epilogue).
    """
    kinds = tuple(k for k, _ in sources)
    arrays = tuple(a for _, a in sources)
    return _fused_block_impl(arrays, w1, scale1, bias1, w2, scale2, bias2,
                             h=h, w_valid=w_valid, row_tile=row_tile,
                             pool_out=pool_out, out_dtype=out_dtype,
                             src_kinds=kinds)
