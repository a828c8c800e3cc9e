"""Pixel-coordinate grids and LIIF-style local-ensemble offsets.

TPU-native counterpart of the reference's coordinate helpers
(reference src/face_simple/rendering.py:9-28 ``get_coords`` and the
4-offset local-ensemble loop in src/face_simple/training.py:195-249).
The reference runs four sequential MLP forward passes; here the offsets are a
leading vmap/batch axis so the whole ensemble is one batched matmul chain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_coords(width: int, height: int, dtype=jnp.float32,
               noise_key=None, raw_noise_std: float = 0.0) -> jnp.ndarray:
    """[H*W, 2] grid of (u, v) in [0, 1]; u varies fastest along width.

    Matches reference rendering.py:9-28 (torch.linspace + meshgrid 'ij');
    optional gaussian uv jitter (the add_noise_uv augmentation, :24-27) with
    an explicit PRNG key.
    """
    x = jnp.linspace(0.0, 1.0, width, dtype=dtype)
    y = jnp.linspace(0.0, 1.0, height, dtype=dtype)
    u, v = jnp.meshgrid(x, y, indexing="xy")  # each [H, W]
    coords = jnp.stack([u, v], axis=-1).reshape(-1, 2)
    if noise_key is not None and raw_noise_std > 0:
        coords = coords + raw_noise_std * jax.random.normal(
            noise_key, coords.shape, dtype)
    return coords


def ensemble_coords(coords: jnp.ndarray, width: int, height: int,
                    eps_shift: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Build the 4 shifted coordinate sets and blend weights of the local
    ensemble (reference training.py:195-249).

    Args:
      coords: [N, 2] base (u, v) in [0, 1].
      eps_shift: scalar noise, reference uses (0.5/H)*rand()/2 (training.py:200),
        0 at eval.

    Returns:
      shifted: [4, N, 2] clamped shifted coords, offset order
        (vx,vy) = (-1,-1), (-1,+1), (+1,-1), (+1,+1).
      weights: [4, N] normalized blend weights with the reference's diagonal
        area swap (training.py:243-248) already applied.
    """
    rx = 0.5 / width
    ry = 0.5 / height
    offsets = jnp.array(
        [[-rx, -ry], [-rx, ry], [rx, -ry], [rx, ry]], dtype=coords.dtype)
    shifted = coords[None, :, :] + offsets[:, None, :] + eps_shift
    shifted = jnp.clip(shifted, 0.0, 1.0)
    # areas measured against the *unshifted* coords, after clamping
    areas = jnp.abs(
        (shifted[..., 0] - coords[None, :, 0])
        * (shifted[..., 1] - coords[None, :, 1])) + 1e-9  # [4, N]
    tot = jnp.sum(areas, axis=0, keepdims=True)
    # diagonal swap: weight of offset k comes from the opposite corner's area
    swapped = areas[jnp.array([3, 2, 1, 0])]
    weights = swapped / tot
    return shifted, weights
