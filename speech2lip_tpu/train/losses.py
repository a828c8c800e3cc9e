"""Loss library for TalkingFace training.

JAX equivalents of the reference's loss helpers (reference
src/face_simple/training.py:576-674) plus the black-hole augmentation noise
generator (tf_nerf.py:306-318).  All functions are pure and jit-safe; RNG is
threaded via explicit keys (the reference relies on unseeded global noise —
SURVEY.md §7 "randomness parity").
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from speech2lip_tpu.models import lpips as lpips_mod


def photometric_loss(pred: jnp.ndarray, target: jnp.ndarray,
                     mask: Optional[jnp.ndarray] = None,
                     weight: float = 1.0) -> jnp.ndarray:
    """(Masked) MSE (reference training.py:605-619)."""
    if mask is not None:
        err = (pred - target) ** 2 * mask
        return weight * jnp.sum(err) / (jnp.sum(mask) + 1e-6)
    return weight * jnp.mean((pred - target) ** 2)


def perceptual_loss(lpips_params, pred: jnp.ndarray, target: jnp.ndarray,
                    weight: float = 1.0) -> jnp.ndarray:
    """LPIPS on [0,1] images, internally mapped to [-1,1]
    (reference training.py:655-674)."""
    x = (pred - 0.5) * 2.0
    y = (target - 0.5) * 2.0
    return weight * jnp.mean(lpips_mod.lpips_distance(lpips_params, x, y))


def black_hole_noise(key, shape_bhw1) -> jnp.ndarray:
    """Binary speckle mask: randn >= 1e-6 (≈50% holes), one channel
    (reference tf_nerf.py:306-311)."""
    noise = jax.random.normal(key, shape_bhw1)
    return (noise >= 1e-6).astype(jnp.float32)


def cosine_bce_loss(a: jnp.ndarray, v: jnp.ndarray,
                    y: jnp.ndarray) -> jnp.ndarray:
    """BCE on the cosine similarity of embedding pairs
    (reference training.py:576-579).  a, v: [B, D] L2-normalized; y: [B]."""
    d = jnp.sum(a * v, axis=-1)
    d = jnp.clip(d, 1e-7, 1.0 - 1e-7)
    return -jnp.mean(y * jnp.log(d) + (1.0 - y) * jnp.log(1.0 - d))


def sync_window_to_syncnet_input(rgb_window: jnp.ndarray) -> jnp.ndarray:
    """[B, T=5, 96, 96, 3] RGB crops -> [B, 48, 96, 15] SyncNet face input.

    Matches reference training.py:587-589: RGB→BGR flip, lower half of H,
    frames stacked along channels (frame-major).
    """
    g = rgb_window[..., ::-1]                    # rgb2bgr
    g = g[:, :, g.shape[2] // 2:, :, :]          # lower half rows
    b, t, h, w, c = g.shape
    # frame-major channel stacking: [B, H, W, T*C]
    return jnp.transpose(g, (0, 2, 3, 1, 4)).reshape(b, h, w, t * c)


def psnr_from_mse(mse: jnp.ndarray) -> jnp.ndarray:
    """PSNR proxy used throughout the reference (train.py:202-204)."""
    return -10.0 * jnp.log(mse) / jnp.log(10.0)
