"""SyncNet lip-sync expert (Wav2Lip SyncNet_color), functional JAX form.

Equivalent of reference src/face_simple/models/syncnet.py:7-67 with the
Conv2d(+BN+ReLU, optional residual) blocks of models/conv.py:5-19.  Used
frozen as the sync-expert loss network (reference training.py:83-95); weights
are ported from ``lipsync_expert.pth`` via tools/convert_weights.py.

Face input: 5 stacked BGR frames, lower half of the 96×96 mouth crop →
[B, 48, 96, 15] NHWC.  Audio input: mel window → [B, 80, 16, 1] NHWC.
Outputs L2-normalized 512-d embeddings.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from speech2lip_tpu.ops import nn as snn

# (out_ch, kernel, stride, padding, residual) — reference syncnet.py:11-33
FACE_SPEC: List[Tuple[int, Tuple[int, int], Tuple[int, int], int, bool]] = [
    (32, (7, 7), (1, 1), 3, False),
    (64, (5, 5), (1, 2), 1, False),
    (64, (3, 3), (1, 1), 1, True),
    (64, (3, 3), (1, 1), 1, True),
    (128, (3, 3), (2, 2), 1, False),
    (128, (3, 3), (1, 1), 1, True),
    (128, (3, 3), (1, 1), 1, True),
    (128, (3, 3), (1, 1), 1, True),
    (256, (3, 3), (2, 2), 1, False),
    (256, (3, 3), (1, 1), 1, True),
    (256, (3, 3), (1, 1), 1, True),
    (512, (3, 3), (2, 2), 1, False),
    (512, (3, 3), (1, 1), 1, True),
    (512, (3, 3), (1, 1), 1, True),
    (512, (3, 3), (2, 2), 1, False),
    (512, (3, 3), (1, 1), 0, False),
    (512, (1, 1), (1, 1), 0, False),
]

# reference syncnet.py:35-53
AUDIO_SPEC: List[Tuple[int, Tuple[int, int], Tuple[int, int], int, bool]] = [
    (32, (3, 3), (1, 1), 1, False),
    (32, (3, 3), (1, 1), 1, True),
    (32, (3, 3), (1, 1), 1, True),
    (64, (3, 3), (3, 1), 1, False),
    (64, (3, 3), (1, 1), 1, True),
    (64, (3, 3), (1, 1), 1, True),
    (128, (3, 3), (3, 3), 1, False),
    (128, (3, 3), (1, 1), 1, True),
    (128, (3, 3), (1, 1), 1, True),
    (256, (3, 3), (3, 2), 1, False),
    (256, (3, 3), (1, 1), 1, True),
    (256, (3, 3), (1, 1), 1, True),
    (512, (3, 3), (1, 1), 0, False),
    (512, (1, 1), (1, 1), 0, False),
]


def _encoder_init(key, in_ch, spec, dtype):
    params, state = [], []
    keys = jax.random.split(key, len(spec))
    c = in_ch
    for k, (out_ch, kernel, _, _, _) in zip(keys, spec):
        bn_p, bn_s = snn.batchnorm_init(out_ch, dtype)
        params.append({"conv": snn.conv2d_init(k, c, out_ch, kernel,
                                               bias=True, dtype=dtype),
                       "bn": bn_p})
        state.append({"bn": bn_s})
        c = out_ch
    return params, state


def _encoder_apply(params, state, x, spec, train):
    new_state = []
    for p, s, (_, _, stride, pad, residual) in zip(params, state, spec):
        y = snn.conv2d(p["conv"], x, stride=stride, padding=pad)
        y, bn_s = snn.batchnorm(p["bn"], s["bn"], y, train)
        if residual:
            y = y + x
        x = snn.relu(y)
        new_state.append({"bn": bn_s})
    return x, new_state


def init(key, dtype=jnp.float32):
    kf, ka = jax.random.split(key)
    fp, fs = _encoder_init(kf, 15, FACE_SPEC, dtype)
    ap, as_ = _encoder_init(ka, 1, AUDIO_SPEC, dtype)
    return ({"face": fp, "audio": ap}, {"face": fs, "audio": as_})


def apply(params, state, mel, faces, train: bool = False):
    """mel: [B, 80, 16, 1]; faces: [B, 48, 96, 15] (5 BGR frames stacked in C).

    Returns (audio_emb [B, 512], face_emb [B, 512], new_state), both
    L2-normalized (reference syncnet.py:56-67).
    """
    face_out, fs = _encoder_apply(params["face"], state["face"], faces,
                                  FACE_SPEC, train)
    audio_out, as_ = _encoder_apply(params["audio"], state["audio"], mel,
                                    AUDIO_SPEC, train)
    a = audio_out.reshape(audio_out.shape[0], -1)
    v = face_out.reshape(face_out.shape[0], -1)
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-12)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-12)
    return a, v, {"face": fs, "audio": as_}
