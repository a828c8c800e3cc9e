"""DeepSpeech-0.1.0 acoustic model as a jitted JAX scan-RNN.

Replaces the reference's frozen-TensorFlow-graph session boundary
(reference preprocess/deepspeech_features/deepspeech_features.py:41-63,
78-112) with a native XLA program (SURVEY.md §2.9 "TF frozen graph" row):

    input [T, 494] (26 MFCC × (9+1+9) context)
    → 3 × (Linear 2048 + clipped ReLU min(relu(x), 20))
    → bidirectional LSTM (2048 units, fused-gate matmul under lax.scan)
    → Linear 2048 + clipped ReLU → Linear 29 logits (a-z, ', space, blank)

Weights port from the deepspeech-0.1.0 .pb via tools/convert_weights.py;
random init preserves shapes for tests.  The model is time-batched: the
whole utterance is one scan, all matmuls hit the MXU.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from speech2lip_tpu.ops import nn as snn

INPUT_DIM = 26 * 19  # 494
HIDDEN = 2048
N_LOGITS = 29
RELU_CLIP = 20.0


def _lstm_init(key, in_dim: int, hidden: int, dtype):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(in_dim + hidden)
    return {
        # fused gate kernel [in+h, 4h] in (i, c, f, o) TF BasicLSTMCell order
        "kernel": jax.random.uniform(k1, (in_dim + hidden, 4 * hidden), dtype,
                                     -bound, bound),
        "bias": jnp.zeros((4 * hidden,), dtype),
    }


def init(key, input_dim: int = INPUT_DIM, hidden: int = HIDDEN,
         n_logits: int = N_LOGITS, dtype=jnp.float32) -> Dict[str, Any]:
    keys = jax.random.split(key, 7)
    return {
        "fc1": snn.linear_init(keys[0], input_dim, hidden, dtype),
        "fc2": snn.linear_init(keys[1], hidden, hidden, dtype),
        "fc3": snn.linear_init(keys[2], hidden, 2 * hidden, dtype),
        "lstm_fw": _lstm_init(keys[3], 2 * hidden, hidden, dtype),
        "lstm_bw": _lstm_init(keys[4], 2 * hidden, hidden, dtype),
        "fc5": snn.linear_init(keys[5], 2 * hidden, hidden, dtype),
        "fc6": snn.linear_init(keys[6], hidden, n_logits, dtype),
    }


def _clipped_relu(x):
    return jnp.minimum(jnp.maximum(x, 0.0), RELU_CLIP)


def _lstm_scan(params, xs, reverse: bool = False,
               forget_bias: float = 1.0):
    """xs: [T, D] -> outputs [T, H]; TF BasicLSTMCell semantics."""
    hidden = params["kernel"].shape[1] // 4

    def cell(carry, x):
        c, h = carry
        gates = jnp.concatenate([x, h], -1) @ params["kernel"] + params["bias"]
        i, j, f, o = jnp.split(gates, 4, axis=-1)
        new_c = (c * jax.nn.sigmoid(f + forget_bias)
                 + jax.nn.sigmoid(i) * jnp.tanh(j))
        new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
        return (new_c, new_h), new_h

    init_carry = (jnp.zeros((hidden,), xs.dtype), jnp.zeros((hidden,), xs.dtype))
    _, ys = jax.lax.scan(cell, init_carry, xs, reverse=reverse)
    return ys


@jax.jit
def apply(params, x: jnp.ndarray) -> jnp.ndarray:
    """x: [T, 494] context windows -> [T, 29] logits."""
    h = _clipped_relu(snn.linear(params["fc1"], x))
    h = _clipped_relu(snn.linear(params["fc2"], h))
    h = _clipped_relu(snn.linear(params["fc3"], h))
    fw = _lstm_scan(params["lstm_fw"], h, reverse=False)
    bw = _lstm_scan(params["lstm_bw"], h, reverse=True)
    h = jnp.concatenate([fw, bw], axis=-1)
    h = _clipped_relu(snn.linear(params["fc5"], h))
    return snn.linear(params["fc6"], h)
