"""Minimal functional neural-net layer library (pure JAX).

Parameters are plain pytrees (nested dicts of jnp arrays): every layer is an
``init(key, ...) -> params`` plus a pure ``apply``-style function, which keeps
the whole model a transparent pytree for pjit sharding, orbax checkpointing,
and torch-weight conversion.

Layouts are TPU-native: activations NHWC / NLC, conv kernels HWIO / LIO;
the torch→JAX weight converter transposes from OIHW / OIL.

Initialization matches torch defaults (kaiming_uniform(a=√5), i.e.
U(±1/√fan_in) for both weight and bias) so train-from-scratch dynamics are
comparable to the reference.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def linear_init(key, in_dim: int, out_dim: int, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(in_dim)
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (out_dim,), dtype, -bound, bound),
    }


def linear(params, x):
    return x @ params["w"] + params["b"]


# ---------------------------------------------------------------------------
# Convolutions (NHWC / NLC)
# ---------------------------------------------------------------------------

def conv2d_init(key, in_ch: int, out_ch: int, kernel: Tuple[int, int],
                bias: bool = True, dtype=jnp.float32):
    kh, kw_ = kernel
    fan_in = in_ch * kh * kw_
    bound = 1.0 / jnp.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    p = {"w": jax.random.uniform(kw, (kh, kw_, in_ch, out_ch), dtype,
                                 -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (out_ch,), dtype, -bound, bound)
    return p


def conv2d(params, x, stride=(1, 1), padding="SAME", dilation=(1, 1)):
    """x: [B, H, W, C]; kernel HWIO. ``padding`` may be int/pair/int-pairs."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif (isinstance(padding, tuple) and len(padding) == 2
          and all(isinstance(p, int) for p in padding)):
        padding = ((padding[0], padding[0]), (padding[1], padding[1]))
    y = jax.lax.conv_general_dilated(
        x, params["w"], window_strides=stride, padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in params:
        y = y + params["b"]
    return y


def conv1d_init(key, in_ch: int, out_ch: int, kernel: int,
                bias: bool = True, dtype=jnp.float32):
    fan_in = in_ch * kernel
    bound = 1.0 / jnp.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    p = {"w": jax.random.uniform(kw, (kernel, in_ch, out_ch), dtype,
                                 -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (out_ch,), dtype, -bound, bound)
    return p


def conv1d(params, x, stride: int = 1, padding: int = 0):
    """x: [B, L, C]; kernel LIO."""
    y = jax.lax.conv_general_dilated(
        x, params["w"], window_strides=(stride,),
        padding=((padding, padding),),
        dimension_numbers=("NHC", "HIO", "NHC"))
    if "b" in params:
        y = y + params["b"]
    return y


# ---------------------------------------------------------------------------
# BatchNorm (2d over NHWC)
# ---------------------------------------------------------------------------

def batchnorm_init(ch: int, dtype=jnp.float32):
    return (
        {"scale": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype)},
        {"mean": jnp.zeros((ch,), dtype), "var": jnp.ones((ch,), dtype)},
    )


def batchnorm(params, state, x, train: bool, momentum: float = 0.1,
              eps: float = 1e-5):
    """Matches torch BatchNorm2d: biased var for normalization, unbiased for
    the running-stat update.  Returns (y, new_state)."""
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        n = x.size // x.shape[-1]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps) * params["scale"]
    return (x - mean) * inv + params["bias"], new_state


# ---------------------------------------------------------------------------
# Pooling / resize
# ---------------------------------------------------------------------------

def maxpool2d(x, window: int = 2, stride: Optional[int] = None):
    stride = stride or window
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1), padding="VALID")


def _align_corners_matrix(out_size: int, in_size: int, dtype):
    """[out, in] bilinear interpolation matrix with align_corners=True."""
    if in_size == 1:
        return jnp.ones((out_size, 1), dtype)
    pos = jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    lo = jnp.clip(lo, 0, in_size - 2)
    w_hi = pos - lo
    rows = jnp.arange(out_size)
    m = jnp.zeros((out_size, in_size), jnp.float32)
    m = m.at[rows, lo].add(1.0 - w_hi)
    m = m.at[rows, lo + 1].add(w_hi)
    return m.astype(dtype)


def upsample_bilinear(x, out_h: int, out_w: int):
    """NHWC bilinear resize with align_corners=True (torch nn.Upsample
    align_corners=True, reference SimpleUnetLight.py:54).

    Expressed as two dense interpolation matmuls so the op runs on the MXU
    instead of a gather-heavy path.
    """
    b, h, w, c = x.shape
    mh = _align_corners_matrix(out_h, h, x.dtype)
    mw = _align_corners_matrix(out_w, w, x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("pw,bowc->bopc", mw, y)


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------

def leaky_relu(x, negative_slope: float = 0.02):
    return jnp.where(x >= 0, x, negative_slope * x)


def relu(x):
    return jnp.maximum(x, 0)
