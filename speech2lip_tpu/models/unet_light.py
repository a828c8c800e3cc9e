"""Light post-fusion U-Net (TPU-native functional form).

Equivalent of the reference's ``SimpleUnetLight``
(reference src/face_simple/models/SimpleUnetLight.py:82-111): a
2-down/2-up U-Net, 64→128→128 channels, bilinear (align_corners=True)
upsampling, DoubleConv = (conv3x3 no-bias → BN → ReLU) ×2, 1×1 output conv.

Runs on the 500×500 fused face image.  Activations are NHWC; 500 is not a
TPU-tile multiple, so callers on the hot path may pad H/W to 512 — the net
itself is size-polymorphic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from speech2lip_tpu.ops import nn as snn


def _double_conv_init(key, cin, cmid, cout, dtype):
    k1, k2 = jax.random.split(key)
    p1, s1 = snn.batchnorm_init(cmid, dtype)
    p2, s2 = snn.batchnorm_init(cout, dtype)
    params = {
        "conv1": snn.conv2d_init(k1, cin, cmid, (3, 3), bias=False, dtype=dtype),
        "bn1": p1,
        "conv2": snn.conv2d_init(k2, cmid, cout, (3, 3), bias=False, dtype=dtype),
        "bn2": p2,
    }
    state = {"bn1": s1, "bn2": s2}
    return params, state


def _double_conv(params, state, x, train):
    x = snn.conv2d(params["conv1"], x, padding=1)
    x, s1 = snn.batchnorm(params["bn1"], state["bn1"], x, train)
    x = snn.relu(x)
    x = snn.conv2d(params["conv2"], x, padding=1)
    x, s2 = snn.batchnorm(params["bn2"], state["bn2"], x, train)
    x = snn.relu(x)
    return x, {"bn1": s1, "bn2": s2}


def init(key, n_channels: int = 3, n_classes: int = 3, base: int = 64,
         dtype=jnp.float32):
    """Initialize params/state pytrees.  base=64 matches the reference."""
    keys = jax.random.split(key, 6)
    params, state = {}, {}
    params["inc"], state["inc"] = _double_conv_init(
        keys[0], n_channels, base, base, dtype)
    params["down1"], state["down1"] = _double_conv_init(
        keys[1], base, base * 2, base * 2, dtype)
    # down2: DoubleConv(128, 128) (factor-2 bilinear bottleneck)
    params["down2"], state["down2"] = _double_conv_init(
        keys[2], base * 2, base * 2, base * 2, dtype)
    # up1: cat(x2[128], up(x3)[128]) = 256 -> mid 128 -> 64
    params["up1"], state["up1"] = _double_conv_init(
        keys[3], base * 4, base * 2, base, dtype)
    # up2: cat(x1[64], up(x)[64]) = 128 -> mid 64 -> 64
    params["up2"], state["up2"] = _double_conv_init(
        keys[4], base * 2, base, base, dtype)
    params["outc"] = snn.conv2d_init(keys[5], base, n_classes, (1, 1),
                                     bias=True, dtype=dtype)
    return params, state


def _up2x(x, out_h: int, out_w: int):
    """Exact-2× bilinear upsample: out[2i] = in[i],
    out[2i+1] = (in[i] + in[i+1]) / 2, edge-clamped, cropped to out_h/out_w.

    Unlike align_corners=True at a non-integer ratio (a GLOBAL sampling
    grid — every output depends on the total size), this is
    translation-equivariant, so a %4-aligned crop of the input produces
    exactly the matching crop of the output.  Matches the fused TPU
    kernel's closed-form row lerp; deviation from the align-corners
    reference semantics is ≤ 0.5 px of sampling position at the far edge
    (the same deviation the fused serving path already carries)."""
    b, h, w, c = x.shape
    xn = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    rows = jnp.stack([x, 0.5 * (x + xn)], axis=2).reshape(b, 2 * h, w, c)
    cn = jnp.concatenate([rows[:, :, 1:], rows[:, :, -1:]], axis=2)
    cols = jnp.stack([rows, 0.5 * (rows + cn)],
                     axis=3).reshape(b, 2 * h, 2 * w, c)
    return cols[:, :out_h, :out_w]


def apply(params, state, x, train: bool = False, exact2x: bool = False):
    """x: [B, H, W, C] -> (logits [B, H, W, n_classes], new_state).

    ``exact2x``: use the translation-equivariant exact-2× upsample
    (windowed static-scene serving path) instead of align-corners
    bilinear."""
    up = (_up2x if exact2x else snn.upsample_bilinear)
    new_state = {}
    x1, new_state["inc"] = _double_conv(params["inc"], state["inc"], x, train)
    x2, new_state["down1"] = _double_conv(
        params["down1"], state["down1"], snn.maxpool2d(x1), train)
    x3, new_state["down2"] = _double_conv(
        params["down2"], state["down2"], snn.maxpool2d(x2), train)

    u = up(x3, x2.shape[1], x2.shape[2])
    u = jnp.concatenate([x2, u], axis=-1)
    u, new_state["up1"] = _double_conv(params["up1"], state["up1"], u, train)

    u = up(u, x1.shape[1], x1.shape[2])
    u = jnp.concatenate([x1, u], axis=-1)
    u, new_state["up2"] = _double_conv(params["up2"], state["up2"], u, train)

    logits = snn.conv2d(params["outc"], u, padding=0)
    return logits, new_state


def _pool_hcw(xh, h: int, w: int, row_tile: int):
    """2×2 maxpool of a haloed HCW buffer -> haloed [*, h//2, C, w//2].

    Rows pool as an elementwise max of row slices; the lane (width) pool
    avoids stride-2 lane slicing (a Mosaic relayout) by selecting the
    even/odd lanes with two one-hot matmuls on the MXU and maxing them."""
    d = xh[:, 1:1 + h, :, :xh.shape[-1]]
    d = jnp.maximum(d[:, 0::2], d[:, 1::2])
    w2 = w // 2
    wp = -(-w2 // 128) * 128
    if wp == w2:
        wp += 128
    cols = jnp.arange(xh.shape[-1])[:, None]
    outs = jnp.arange(wp)[None, :]
    sel_even = (cols == 2 * outs).astype(d.dtype)
    sel_odd = (cols == 2 * outs + 1).astype(d.dtype)
    pooled = jnp.maximum(d @ sel_even, d @ sel_odd)
    hp = -(-(h // 2) // row_tile) * row_tile
    return jnp.pad(pooled, ((0, 0), (1, hp - h // 2 + 1), (0, 0), (0, 0)))


def _upsample_hcw(xh, h: int, w: int, out_h: int, out_w: int,
                  row_tile: int):
    """Bilinear align-corners 2× upsample of a haloed HCW buffer, emitted
    directly in haloed form.  Width interpolates on the MXU (lane-dim
    matmul whose matrix carries the zero pad lanes); height interpolates
    as a two-row gather + lerp (a dim-1 einsum is a transpose-heavy
    contraction XLA handles badly in this layout)."""
    d = xh[:, 1:1 + h, :, :w]
    hp = -(-out_h // row_tile) * row_tile
    wp = -(-out_w // 128) * 128
    if wp == out_w:
        wp += 128
    mw = snn._align_corners_matrix(out_w, w, d.dtype).T  # [w, out_w]
    mw = jnp.pad(mw, ((0, 0), (0, wp - out_w)))
    y = d @ mw  # [B, h, C, wp]

    # exact-2× align-corners structure: out[2k] = lerp(y[k-1], y[k]) and
    # out[2k+1] = lerp(y[k], y[k+1]) — shifted slices + one interleave
    # reshape on the major row dim; no gather (slow on this layout)
    assert out_h == 2 * h
    bsz, _, c, _ = y.shape
    pos = jnp.arange(out_h, dtype=jnp.float32) * (h - 1) / (out_h - 1)
    te = (pos[2::2] - jnp.arange(h - 1)).astype(d.dtype)[None, :, None,
                                                        None]
    to = (pos[1::2][:h - 1] - jnp.arange(h - 1)).astype(d.dtype)[
        None, :, None, None]
    even = jnp.concatenate(
        [y[:, :1], (1 - te) * y[:, :h - 1] + te * y[:, 1:]], axis=1)
    odd = jnp.concatenate(
        [(1 - to) * y[:, :h - 1] + to * y[:, 1:], y[:, h - 1:]], axis=1)
    up = jnp.stack([even, odd], axis=2).reshape(bsz, out_h, c, wp)
    return jnp.pad(up, ((0, 0), (1, hp - out_h + 1), (0, 0), (0, 0)))


def apply_infer_hcw(params, state, x, row_tile: int = 16):
    """Inference forward through the haloed-HCW Pallas conv kernels
    (ops/pallas/conv_hcw): every DoubleConv is two fused conv+BN+ReLU
    kernel launches with full 128-lane MXU output; pool/upsample/concat
    glue runs in the same [B, H, C, W] layout (upsample matrices emit the
    halo directly).  Numerics match ``apply(train=False)`` to
    accumulation tolerance.

    x: [B, H, W, C] NHWC (the composite output) -> [B, H, W, n_classes].
    """
    from speech2lip_tpu.ops.pallas.conv_hcw import conv3x3_hcw, halo_pad
    from speech2lip_tpu.ops.pallas.conv_block import fold_bn

    b, h, w, cin = x.shape

    def dc(name, vh, hh, ww, cpad=0, rt=None):
        rt = rt or row_tile
        p, s = params[name], state[name]
        s1, b1 = fold_bn(p["bn1"], s["bn1"])
        s2, b2 = fold_bn(p["bn2"], s["bn2"])
        w1 = p["conv1"]["w"]
        if cpad:
            w1 = jnp.pad(w1, ((0, 0), (0, 0), (0, cpad), (0, 0)))
        vh = conv3x3_hcw(vh, w1, s1, b1, hh, ww, row_tile=rt)
        return conv3x3_hcw(vh, p["conv2"]["w"], s2, b2, hh, ww,
                           row_tile=rt)

    # NHWC -> haloed HCW with the 3 input channels padded to a 16-sublane
    # tile (cheap: the raw input is only H·W·3)
    xh = jnp.transpose(x, (0, 1, 3, 2))
    xh = jnp.pad(xh, ((0, 0), (0, 0), (0, 16 - cin), (0, 0)))
    xh = halo_pad(xh, row_tile)

    x1 = dc("inc", xh, h, w, cpad=16 - cin)
    h2, w2 = h // 2, w // 2
    x2 = dc("down1", _pool_hcw(x1, h, w, row_tile), h2, w2)
    h3, w3 = h2 // 2, w2 // 2
    x3 = dc("down2", _pool_hcw(x2, h2, w2, row_tile), h3, w3,
            rt=min(8, row_tile))

    u = _upsample_hcw(x3, h3, w3, h2, w2, row_tile)
    u = jnp.concatenate([x2, u], axis=2)
    u = dc("up1", u, h2, w2)

    u = _upsample_hcw(u, h2, w2, h, w, row_tile)
    u = jnp.concatenate([x1, u], axis=2)
    u = dc("up2", u, h, w)

    # 1×1 output conv in-layout, then transpose the tiny 3-channel result
    d = u[:, 1:1 + h, :, :w]
    wo = params["outc"]["w"][0, 0]          # [64, n_classes]
    y = jnp.einsum("bhcw,cd->bhdw", d, wo)
    return jnp.transpose(y, (0, 1, 3, 2)) + params["outc"]["b"]


def apply_infer_fused(params, state, x, hcw_input: bool = False,
                      hcw_cin: int = 3):
    """Inference forward as five fully-fused Pallas blocks
    (ops/pallas/conv_hcw.fused_block_hcw): every DoubleConv runs with its
    2×2 maxpool (down path) or its 2× upsample + skip concat (up path)
    folded into the kernel — no pooled/upsampled/concatenated tensor ever
    exists in HBM, and conv intermediates stay in VMEM.  ~1.25× the XLA
    U-Net at May geometry (measured v5e batch 16 bf16: ~30 vs 38 ms).

    x: [B, H, W, C] NHWC -> [B, H, W, n_classes].  H and W must be
    multiples of 4 (both pool levels and the exact-2x upsamples need even
    sizes at every stage).

    ``hcw_input=True`` takes ``x`` already in the kernels' [B, H, 16, W]
    layout (transposed + channel-padded to 16), i.e. what a host-side HCW
    data layout would deliver — exists so tools/bench_hcw_ingest.py can
    measure the ingest transpose's true end-to-end cost rather than an
    isolated (layout-assignment no-op) transpose.  ``hcw_cin`` is the TRUE
    channel count inside the 16-padded dim (the conv1 weight padding must
    match it; the padded-to-16 shape alone can't tell 3 from, say, 4).
    """
    from speech2lip_tpu.ops.pallas.conv_hcw import (fused_block_hcw,
                                                    halo2_pad)
    from speech2lip_tpu.ops.pallas.conv_block import fold_bn

    if hcw_input:
        b, h, cpadded, w = x.shape
        assert cpadded == 16, x.shape
        cin = hcw_cin  # the pad carries zeros; conv1 weights pad to match
    else:
        b, h, w, cin = x.shape
    assert h % 4 == 0 and w % 4 == 0, (h, w)

    def blk(name, sources, hh, ww, rt, pool=False, cpad=0):
        p, s = params[name], state[name]
        s1, b1 = fold_bn(p["bn1"], s["bn1"])
        s2, b2 = fold_bn(p["bn2"], s["bn2"])
        w1 = p["conv1"]["w"]
        if cpad:
            w1 = jnp.pad(w1, ((0, 0), (0, 0), (0, cpad), (0, 0)))
        return fused_block_hcw(sources, w1, s1, b1, p["conv2"]["w"], s2,
                               b2, hh, ww, row_tile=rt, pool_out=pool)

    if hcw_input:
        xh = x
    else:
        xh = jnp.transpose(x, (0, 1, 3, 2))
        xh = jnp.pad(xh, ((0, 0), (0, 0), (0, 16 - cin), (0, 0)))
    xh = halo2_pad(xh, 16)

    # row tiles: a pooled buffer's padded height is parent_hp/2, so each
    # consumer picks the largest tile dividing it up to a per-block cap
    # (v5e sweep at May 500², tools sweep under the raised VMEM limit:
    # rt 32 beats 8/16 on inc/down1/up1/up2 — up2 19.7 -> 16.9
    # ms/batch-32 — while down2 prefers 16 and rt 64 regresses)
    def pick(hp, cap, mult):
        rt = mult
        for cand in range(mult, cap + 1, mult):
            if hp % cand == 0:
                rt = cand
        return rt

    hp1 = -(-h // 16) * 16
    hp2, hp3 = hp1 // 2, hp1 // 4

    x1, x1p = blk("inc", [("direct", xh)], h, w, pick(hp1, 32, 4),
                  pool=True, cpad=16 - cin)
    h2, w2 = h // 2, w // 2
    x2, x2p = blk("down1", [("direct", x1p)], h2, w2, pick(hp2, 32, 4),
                  pool=True)
    h3, w3 = h2 // 2, w2 // 2
    x3 = blk("down2", [("direct", x2p)], h3, w3, pick(hp3, 16, 4))
    u = blk("up1", [("direct", x2), ("up2x", x3)], h2, w2,
            pick(hp2, 32, 8))
    u = blk("up2", [("direct", x1), ("up2x", u)], h, w, pick(hp1, 32, 8))

    d = u[:, 2:2 + h, :, :w]
    wo = params["outc"]["w"][0, 0]
    y = jnp.einsum("bhcw,cd->bhdw", d, wo)
    return jnp.transpose(y, (0, 1, 3, 2)) + params["outc"]["b"]


def apply_infer_pallas(params, state, x, row_tile: int = 25):
    """Inference-only forward through the fused Pallas conv kernels.

    Each DoubleConv runs as two fused conv3x3+BN+ReLU kernels
    (ops/pallas/conv_block) with the eval BatchNorm folded to per-channel
    scale/bias; pooling/upsample/concat/1x1 stay XLA.  Numerics match
    ``apply(train=False)`` to accumulation tolerance.
    """
    from speech2lip_tpu.ops.pallas.conv_block import (double_conv_infer,
                                                      fold_bn)

    def dc(name, v, rt):
        p, s = params[name], state[name]
        s1, b1 = fold_bn(p["bn1"], s["bn1"])
        s2, b2 = fold_bn(p["bn2"], s["bn2"])
        return double_conv_infer(v, p["conv1"]["w"], s1, b1,
                                 p["conv2"]["w"], s2, b2, row_tile=rt)

    x1 = dc("inc", x, row_tile)
    x2 = dc("down1", snn.maxpool2d(x1), row_tile)
    x3 = dc("down2", snn.maxpool2d(x2), row_tile)

    u = snn.upsample_bilinear(x3, x2.shape[1], x2.shape[2])
    u = jnp.concatenate([x2, u], axis=-1)
    u = dc("up1", u, row_tile)

    u = snn.upsample_bilinear(u, x1.shape[1], x1.shape[2])
    u = jnp.concatenate([x1, u], axis=-1)
    u = dc("up2", u, row_tile)

    return snn.conv2d(params["outc"], u, padding=0)
