"""BiSeNet face parser (ResNet-18 backbone), functional JAX form.

Equivalent of the reference's face-parsing network (reference
preprocess/face_parsing/BiSeNet.py:230-254, resnet.py:58-109): ResNet-18
features at strides 8/16/32, ContextPath with two Attention-Refinement
modules + a global-pool tail, a Feature-Fusion module fusing the res8
feature with the refined context feature, and a 19-class output head
upsampled to input size (the reference deletes the SpatialPath and reuses
the res8 feature, BiSeNet.py:233-240).

Used by preprocessing STEP5 (canonical head-mask, face_tracker.py:613-659).
Weights port from ``79999_iter.pth`` via tools/convert_weights.py (add the
'bisenet' kind); random init preserves shapes for tests.  Inference-only:
BN always uses running stats.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from speech2lip_tpu.ops import nn as snn

N_CLASSES = 19
# ImageNet normalization used by the parsing entry (preprocess/utils.py:55-58)
_MEAN = jnp.array([0.485, 0.456, 0.406])
_STD = jnp.array([0.229, 0.224, 0.225])


def _conv_bn(key, cin, cout, k, dtype):
    p, s = snn.batchnorm_init(cout, dtype)
    return ({"conv": snn.conv2d_init(key, cin, cout, (k, k), bias=False,
                                     dtype=dtype), "bn": p}, {"bn": s})


def _apply_conv_bn_relu(params, state, x, stride=1, padding=1):
    x = snn.conv2d(params["conv"], x, stride=stride, padding=padding)
    x, _ = snn.batchnorm(params["bn"], state["bn"], x, train=False)
    return snn.relu(x)


def _basic_block_init(key, cin, cout, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    p1, s1 = _conv_bn(k1, cin, cout, 3, dtype)
    p2, s2 = _conv_bn(k2, cout, cout, 3, dtype)
    params = {"c1": p1, "c2": p2}
    state = {"c1": s1, "c2": s2}
    if cin != cout:
        pd, sd = _conv_bn(k3, cin, cout, 1, dtype)
        params["down"] = pd
        state["down"] = sd
    return params, state


def _basic_block(params, state, x, stride):
    r = snn.conv2d(params["c1"]["conv"], x, stride=stride, padding=1)
    r, _ = snn.batchnorm(params["c1"]["bn"], state["c1"]["bn"], r, False)
    r = snn.relu(r)
    r = snn.conv2d(params["c2"]["conv"], r, padding=1)
    r, _ = snn.batchnorm(params["c2"]["bn"], state["c2"]["bn"], r, False)
    if "down" in params:
        x = snn.conv2d(params["down"]["conv"], x, stride=stride, padding=0)
        x, _ = snn.batchnorm(params["down"]["bn"], state["down"]["bn"], x,
                             False)
    return snn.relu(x + r)


def _arm_init(key, cin, cout, dtype):
    k1, k2 = jax.random.split(key)
    conv, conv_s = _conv_bn(k1, cin, cout, 3, dtype)
    att_p, att_s = snn.batchnorm_init(cout, dtype)
    return ({"conv": conv,
             "atten": snn.conv2d_init(k2, cout, cout, (1, 1), bias=False,
                                      dtype=dtype),
             "atten_bn": att_p},
            {"conv": conv_s, "atten_bn": att_s})


def _arm(params, state, x):
    feat = _apply_conv_bn_relu(params["conv"], state["conv"], x)
    att = jnp.mean(feat, axis=(1, 2), keepdims=True)
    att = snn.conv2d(params["atten"], att, padding=0)
    att, _ = snn.batchnorm(params["atten_bn"], state["atten_bn"], att, False)
    return feat * jax.nn.sigmoid(att)


def init(key, n_classes: int = N_CLASSES, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 40))
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}

    # ResNet-18 stem + layers (2 blocks each, 64/128/256/512)
    params["stem"], state["stem"] = _conv_bn(next(keys), 3, 64, 7, dtype)
    for name, cin, cout in (("layer1", 64, 64), ("layer2", 64, 128),
                            ("layer3", 128, 256), ("layer4", 256, 512)):
        blocks_p, blocks_s = [], []
        for i in range(2):
            p, s = _basic_block_init(next(keys), cin if i == 0 else cout,
                                     cout, dtype)
            blocks_p.append(p)
            blocks_s.append(s)
        params[name], state[name] = blocks_p, blocks_s

    # ContextPath
    params["arm16"], state["arm16"] = _arm_init(next(keys), 256, 128, dtype)
    params["arm32"], state["arm32"] = _arm_init(next(keys), 512, 128, dtype)
    params["head32"], state["head32"] = _conv_bn(next(keys), 128, 128, 3, dtype)
    params["head16"], state["head16"] = _conv_bn(next(keys), 128, 128, 3, dtype)
    params["avg"], state["avg"] = _conv_bn(next(keys), 512, 128, 1, dtype)

    # FFM (256 = res8 128 + context 128)
    params["ffm"], state["ffm"] = _conv_bn(next(keys), 256, 256, 1, dtype)
    params["ffm_a1"] = snn.conv2d_init(next(keys), 256, 64, (1, 1),
                                       bias=False, dtype=dtype)
    params["ffm_a2"] = snn.conv2d_init(next(keys), 64, 256, (1, 1),
                                       bias=False, dtype=dtype)

    # output head (the auxiliary 16/32 heads exist in the reference but only
    # the main head is used at inference, preprocess/utils.py:59-62)
    params["out"], state["out"] = _conv_bn(next(keys), 256, 256, 3, dtype)
    params["out_final"] = snn.conv2d_init(next(keys), 256, n_classes, (1, 1),
                                          bias=False, dtype=dtype)
    return params, state


def _resize_nearest(x, h, w):
    b, hh, ww, c = x.shape
    ry = (jnp.arange(h) * hh // h).astype(jnp.int32)
    rx = (jnp.arange(w) * ww // w).astype(jnp.int32)
    return x[:, ry][:, :, rx]


def apply(params, state, x: jnp.ndarray) -> jnp.ndarray:
    """x: [B, H, W, 3] in [0, 1] RGB -> [B, H, W, n_classes] logits."""
    x = (x - _MEAN) / _STD
    h0, w0 = x.shape[1:3]

    # backbone
    y = _apply_conv_bn_relu(params["stem"], state["stem"], x, stride=2,
                            padding=3)
    y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                              (1, 3, 3, 1), (1, 2, 2, 1),
                              padding=((0, 0), (1, 1), (1, 1), (0, 0)))
    for name, stride in (("layer1", 1), ("layer2", 2), ("layer3", 2),
                         ("layer4", 2)):
        for i, (p, s) in enumerate(zip(params[name], state[name])):
            y = _basic_block(p, s, y, stride if i == 0 else 1)
        if name == "layer2":
            feat8 = y
        elif name == "layer3":
            feat16 = y
    feat32 = y

    # context path
    avg = jnp.mean(feat32, axis=(1, 2), keepdims=True)
    avg = _apply_conv_bn_relu(params["avg"], state["avg"], avg, padding=0)
    avg_up = jnp.broadcast_to(avg, feat32.shape[:3] + (128,))
    f32 = _arm(params["arm32"], state["arm32"], feat32) + avg_up
    f32 = _resize_nearest(f32, feat16.shape[1], feat16.shape[2])
    f32 = _apply_conv_bn_relu(params["head32"], state["head32"], f32)
    f16 = _arm(params["arm16"], state["arm16"], feat16) + f32
    f16 = _resize_nearest(f16, feat8.shape[1], feat8.shape[2])
    f16 = _apply_conv_bn_relu(params["head16"], state["head16"], f16)

    # FFM: res8 as the spatial path
    fcat = jnp.concatenate([feat8, f16], axis=-1)
    feat = _apply_conv_bn_relu(params["ffm"], state["ffm"], fcat, padding=0)
    att = jnp.mean(feat, axis=(1, 2), keepdims=True)
    att = snn.relu(snn.conv2d(params["ffm_a1"], att, padding=0))
    att = jax.nn.sigmoid(snn.conv2d(params["ffm_a2"], att, padding=0))
    feat = feat * att + feat

    out = _apply_conv_bn_relu(params["out"], state["out"], feat)
    out = snn.conv2d(params["out_final"], out, padding=0)
    return snn.upsample_bilinear(out, h0, w0)


def parse_face(params, state, image: jnp.ndarray) -> jnp.ndarray:
    """[H, W, 3] float RGB in [0,1] -> [H, W] int class map at 512² eval
    resolution then argmax (preprocess/utils.py:41-66)."""
    import jax.image as jimage
    x = jimage.resize(image, (512, 512, 3), method="bilinear")
    logits = apply(params, state, x[None])
    classes = jnp.argmax(logits[0], axis=-1)
    return classes
