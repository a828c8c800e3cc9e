"""2D-FAN face-alignment network (68-landmark detector), functional JAX form.

TPU-native equivalent of the ``face_alignment`` dependency the reference's
STEP1 uses for landmarks (reference preprocess/detect_landmarks.py:9-63;
SURVEY.md §2.8).  Architecture: Bulat & Tzimiropoulos FAN — a conv stem and
4 stacked depth-4 hourglass modules with 3-branch residual ConvBlocks,
emitting 68 heatmaps at 64×64; landmarks decode as argmax + quarter-pixel
refinement (face_alignment's decoding convention).

Weights port from face_alignment's ``2DFAN4`` checkpoint via
tools/convert_weights.py (kind 'fan'); random init preserves shapes for
tests.  Face bounding boxes (the reference uses the DSFD detector) can come
from any source; preprocess/landmarks.py offers a parsing-based fallback.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from speech2lip_tpu.ops import nn as snn

N_LANDMARKS = 68
N_MODULES = 4
HG_DEPTH = 4
HG_FEATS = 256


def _bn_relu_conv_init(key, cin, cout, k, dtype):
    bn_p, bn_s = snn.batchnorm_init(cin, dtype)
    return ({"bn": bn_p,
             "conv": snn.conv2d_init(key, cin, cout, (k, k), bias=False,
                                     dtype=dtype)},
            {"bn": bn_s})


def _bn_relu_conv(params, state, x, padding):
    x, _ = snn.batchnorm(params["bn"], state["bn"], x, train=False)
    x = snn.relu(x)
    return snn.conv2d(params["conv"], x, padding=padding)


def _conv_block_init(key, cin, cout, dtype):
    """FAN ConvBlock: 3 chained BN-ReLU-convs producing out/2, out/4, out/4
    channels, concatenated; 1×1-projected residual when cin != cout."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p1, s1 = _bn_relu_conv_init(k1, cin, cout // 2, 3, dtype)
    p2, s2 = _bn_relu_conv_init(k2, cout // 2, cout // 4, 3, dtype)
    p3, s3 = _bn_relu_conv_init(k3, cout // 4, cout // 4, 3, dtype)
    params = {"b1": p1, "b2": p2, "b3": p3}
    state = {"b1": s1, "b2": s2, "b3": s3}
    if cin != cout:
        bn_p, bn_s = snn.batchnorm_init(cin, dtype)
        params["down"] = {"bn": bn_p,
                          "conv": snn.conv2d_init(k4, cin, cout, (1, 1),
                                                  bias=False, dtype=dtype)}
        state["down"] = {"bn": bn_s}
    return params, state


def _conv_block(params, state, x):
    y1 = _bn_relu_conv(params["b1"], state["b1"], x, padding=1)
    y2 = _bn_relu_conv(params["b2"], state["b2"], y1, padding=1)
    y3 = _bn_relu_conv(params["b3"], state["b3"], y2, padding=1)
    out = jnp.concatenate([y1, y2, y3], axis=-1)
    if "down" in params:
        r, _ = snn.batchnorm(params["down"]["bn"], state["down"]["bn"], x,
                             train=False)
        r = snn.conv2d(params["down"]["conv"], snn.relu(r), padding=0)
    else:
        r = x
    return out + r


def _hourglass_init(key, depth, feats, dtype):
    keys = iter(jax.random.split(key, depth * 4 + 1))
    params, state = {}, {}
    for d in range(1, depth + 1):
        for tag in ("up1", "low1", "low3"):
            p, s = _conv_block_init(next(keys), feats, feats, dtype)
            params[f"{tag}_{d}"], state[f"{tag}_{d}"] = p, s
    p, s = _conv_block_init(next(keys), feats, feats, dtype)
    params["low2_1"], state["low2_1"] = p, s  # innermost
    return params, state


def _hourglass(params, state, x, depth):
    def recurse(level, inp):
        up1 = _conv_block(params[f"up1_{level}"], state[f"up1_{level}"], inp)
        low = jax.lax.reduce_window(inp, -jnp.inf, jax.lax.max,
                                    (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        low = _conv_block(params[f"low1_{level}"], state[f"low1_{level}"], low)
        if level > 1:
            low = recurse(level - 1, low)
        else:
            low = _conv_block(params["low2_1"], state["low2_1"], low)
        low = _conv_block(params[f"low3_{level}"], state[f"low3_{level}"], low)
        up2 = jnp.repeat(jnp.repeat(low, 2, axis=1), 2, axis=2)  # nearest ×2
        return up1 + up2
    return recurse(depth, x)


def init(key, n_modules: int = N_MODULES, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 8 + n_modules * 8))
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}
    params["conv1"] = snn.conv2d_init(next(keys), 3, 64, (7, 7), bias=True,
                                      dtype=dtype)
    params["bn1"], state["bn1"] = snn.batchnorm_init(64, dtype)
    params["conv2"], state["conv2"] = _conv_block_init(next(keys), 64, 128,
                                                       dtype)
    params["conv3"], state["conv3"] = _conv_block_init(next(keys), 128, 128,
                                                       dtype)
    params["conv4"], state["conv4"] = _conv_block_init(next(keys), 128,
                                                       HG_FEATS, dtype)
    hgs, tops, convs_last, bns_end, preds, bls, als = [], [], [], [], [], [], []
    hg_states, top_states, last_states, end_states = [], [], [], []
    for m in range(n_modules):
        p, s = _hourglass_init(next(keys), HG_DEPTH, HG_FEATS, dtype)
        hgs.append(p); hg_states.append(s)
        p, s = _conv_block_init(next(keys), HG_FEATS, HG_FEATS, dtype)
        tops.append(p); top_states.append(s)
        convs_last.append(snn.conv2d_init(next(keys), HG_FEATS, HG_FEATS,
                                          (1, 1), bias=True, dtype=dtype))
        bp, bs = snn.batchnorm_init(HG_FEATS, dtype)
        bns_end.append(bp); end_states.append(bs)
        preds.append(snn.conv2d_init(next(keys), HG_FEATS, N_LANDMARKS,
                                     (1, 1), bias=True, dtype=dtype))
        if m < n_modules - 1:
            bls.append(snn.conv2d_init(next(keys), HG_FEATS, HG_FEATS, (1, 1),
                                       bias=True, dtype=dtype))
            als.append(snn.conv2d_init(next(keys), N_LANDMARKS, HG_FEATS,
                                       (1, 1), bias=True, dtype=dtype))
    params.update({"hg": hgs, "top": tops, "conv_last": convs_last,
                   "bn_end": bns_end, "pred": preds, "bl": bls, "al": als})
    state.update({"hg": hg_states, "top": top_states, "bn_end": end_states})
    return params, state


def apply(params, state, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: [B, 256, 256, 3] in [0, 1] -> list of [B, 64, 64, 68] heatmaps
    (one per hourglass module; the last is the prediction)."""
    y = snn.conv2d(params["conv1"], x, stride=2, padding=3)
    y, _ = snn.batchnorm(params["bn1"], state["bn1"], y, train=False)
    y = snn.relu(y)
    y = _conv_block(params["conv2"], state["conv2"], y)
    y = jax.lax.reduce_window(y, 0.0, jax.lax.add, (1, 2, 2, 1),
                              (1, 2, 2, 1), "VALID") / 4.0  # avg_pool2
    y = _conv_block(params["conv3"], state["conv3"], y)
    y = _conv_block(params["conv4"], state["conv4"], y)

    outputs = []
    prev = y
    n = len(params["hg"])
    for m in range(n):
        hg = _hourglass(params["hg"][m], state["hg"][m], prev, HG_DEPTH)
        ll = _conv_block(params["top"][m], state["top"][m], hg)
        ll = snn.conv2d(params["conv_last"][m], ll, padding=0)
        ll, _ = snn.batchnorm(params["bn_end"][m], state["bn_end"][m], ll,
                              train=False)
        ll = snn.relu(ll)
        hm = snn.conv2d(params["pred"][m], ll, padding=0)
        outputs.append(hm)
        if m < n - 1:
            prev = (prev + snn.conv2d(params["bl"][m], ll, padding=0)
                    + snn.conv2d(params["al"][m], hm, padding=0))
    return outputs


def decode_heatmaps(heatmaps: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 68] heatmaps -> [B, 68, 2] (x, y) in heatmap pixels with
    face_alignment's quarter-pixel offset toward the gradient."""
    b, h, w, n = heatmaps.shape
    hm = jnp.transpose(heatmaps, (0, 3, 1, 2)).reshape(b, n, h * w)
    idx = jnp.argmax(hm, axis=-1)
    ys = idx // w
    xs = idx % w

    def refine(hm_i, x, y):
        x1 = jnp.clip(x + 1, 0, w - 1)
        x0 = jnp.clip(x - 1, 0, w - 1)
        y1 = jnp.clip(y + 1, 0, h - 1)
        y0 = jnp.clip(y - 1, 0, h - 1)
        dx = hm_i[y * w + x1] - hm_i[y * w + x0]
        dy = hm_i[y1 * w + x] - hm_i[y0 * w + x]
        return (x.astype(jnp.float32) + 0.25 * jnp.sign(dx),
                y.astype(jnp.float32) + 0.25 * jnp.sign(dy))

    fx, fy = jax.vmap(jax.vmap(refine))(hm, xs, ys)
    return jnp.stack([fx, fy], axis=-1)
