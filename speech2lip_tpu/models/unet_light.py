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


def apply(params, state, x, train: bool = False):
    """x: [B, H, W, C] -> (logits [B, H, W, n_classes], new_state)."""
    new_state = {}
    x1, new_state["inc"] = _double_conv(params["inc"], state["inc"], x, train)
    x2, new_state["down1"] = _double_conv(
        params["down1"], state["down1"], snn.maxpool2d(x1), train)
    x3, new_state["down2"] = _double_conv(
        params["down2"], state["down2"], snn.maxpool2d(x2), train)

    u = snn.upsample_bilinear(x3, x2.shape[1], x2.shape[2])
    u = jnp.concatenate([x2, u], axis=-1)
    u, new_state["up1"] = _double_conv(params["up1"], state["up1"], u, train)

    u = snn.upsample_bilinear(u, x1.shape[1], x1.shape[2])
    u = jnp.concatenate([x1, u], axis=-1)
    u, new_state["up2"] = _double_conv(params["up2"], state["up2"], u, train)

    logits = snn.conv2d(params["outc"], u, padding=0)
    return logits, new_state


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
