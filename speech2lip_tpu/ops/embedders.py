"""Positional-encoding embedders.

JAX equivalents of the reference's NeRF-style ``Embedder`` and the
transformer-style ``PositionalEncodingTime`` (reference
src/face_simple/models/tf_nerf.py:391-442).  Both are pure functions of
static hyperparameters — no parameters, fully fusable by XLA.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def fourier_embed(x: jnp.ndarray, multires: int,
                  include_input: bool = True) -> jnp.ndarray:
    """NeRF positional encoding: [..., D] -> [..., D*(1 + 2*multires)].

    Output layout matches the reference exactly (tf_nerf.py:404-425):
    [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...] where each term
    spans all D input dims before the next term starts.
    """
    if multires <= 0:
        return x
    freqs = 2.0 ** jnp.arange(multires, dtype=x.dtype)  # log-sampled
    parts = [x] if include_input else []
    for i in range(multires):
        parts.append(jnp.sin(x * freqs[i]))
        parts.append(jnp.cos(x * freqs[i]))
    return jnp.concatenate(parts, axis=-1)


def fourier_embed_dim(input_dims: int, multires: int,
                      include_input: bool = True) -> int:
    return input_dims * ((1 if include_input else 0) + 2 * multires)


def time_embed(position: jnp.ndarray, out_dims: int = 20) -> jnp.ndarray:
    """Transformer sin/cos time embedding of a scalar frame index.

    Matches reference PositionalEncodingTime (tf_nerf.py:427-442): encodes a
    single scalar (the reference takes position[0]) into an interleaved
    [out_dims] vector pe[0::2]=sin, pe[1::2]=cos.
    """
    position = jnp.asarray(position, jnp.float32).reshape(())
    half = out_dims // 2
    div_term = jnp.exp(
        jnp.arange(0, out_dims, 2, dtype=jnp.float32)
        * (-(math.log(10000.0) / out_dims)))  # [half]
    pe = jnp.stack([jnp.sin(position * div_term),
                    jnp.cos(position * div_term)], axis=-1)  # [half, 2]
    return pe.reshape(2 * half)
