"""LPIPS perceptual distance (AlexNet backbone, v0.1), functional JAX form.

Equivalent of the external ``lpips.LPIPS(net='alex', version='0.1')`` the
reference uses as its perceptual loss (reference
src/face_simple/training.py:76, applied at :655-674 on [-1, 1] images).

Structure: per-channel input scaling → AlexNet conv features at relu1..relu5
→ channel-unit-normalize → squared difference → 1×1 linear heads (no bias)
→ spatial mean → sum over layers.  Weights port from ``alex.pth`` +
``lpips_weights_v0.1/alex.pth`` via tools/convert_weights.py; randomly
initialized weights still yield a valid (untrained) perceptual metric for
tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from speech2lip_tpu.ops import nn as snn

# (out_ch, kernel, stride, padding) for the 5 AlexNet feature convs
ALEX_SPEC = [
    (64, (11, 11), (4, 4), 2),
    (192, (5, 5), (1, 1), 2),
    (384, (3, 3), (1, 1), 1),
    (256, (3, 3), (1, 1), 1),
    (256, (3, 3), (1, 1), 1),
]
# maxpool(k3, s2) after relu1 and relu2
_POOL_AFTER = {0, 1}

# ImageNet scaling layer constants (lpips v0.1)
_SHIFT = jnp.array([-0.030, -0.088, -0.188], jnp.float32)
_SCALE = jnp.array([0.458, 0.448, 0.450], jnp.float32)


def init(key, dtype=jnp.float32):
    keys = jax.random.split(key, 2 * len(ALEX_SPEC))
    convs, lins = [], []
    c = 3
    for i, (out_ch, kernel, _, _) in enumerate(ALEX_SPEC):
        convs.append(snn.conv2d_init(keys[2 * i], c, out_ch, kernel,
                                     bias=True, dtype=dtype))
        lins.append(snn.conv2d_init(keys[2 * i + 1], out_ch, 1, (1, 1),
                                    bias=False, dtype=dtype))
        c = out_ch
    return {"convs": convs, "lins": lins}


def _features(params, x):
    feats = []
    h = x
    for i, ((_, _, stride, pad), conv) in enumerate(zip(ALEX_SPEC,
                                                        params["convs"])):
        h = snn.relu(snn.conv2d(conv, h, stride=stride, padding=pad))
        if h.shape[1] == 0 or h.shape[2] == 0:
            raise ValueError(
                f"LPIPS input {x.shape} too small: feature layer {i} has "
                f"zero spatial size {h.shape}; inputs must be ≥ ~32px")
        feats.append(h)
        if i in _POOL_AFTER:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max,
                window_dimensions=(1, 3, 3, 1),
                window_strides=(1, 2, 2, 1), padding="VALID")
    return feats


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


def lpips_distance(params, x, y):
    """Perceptual distance between two [B, H, W, 3] images in [-1, 1].

    Returns [B] distances (torch lpips returns [B,1,1,1]; the reference
    takes .mean(), training.py:672).
    """
    xs = (x - _SHIFT) / _SCALE
    ys = (y - _SHIFT) / _SCALE
    fx = _features(params, xs)
    fy = _features(params, ys)
    total = 0.0
    for f1, f2, lin in zip(fx, fy, params["lins"]):
        d = (_unit_normalize(f1) - _unit_normalize(f2)) ** 2
        val = snn.conv2d(lin, d, padding=0)            # [B, h, w, 1]
        total = total + jnp.mean(val, axis=(1, 2, 3))  # spatial mean
    return total
