"""Forward (splat) warping with z-resolve.

TPU-native equivalent of the Forward-Warp CUDA extension the reference's
controllable-pose path uses (reference src/face_simple/models/utils.py:267
``forward_warp(interpolation_mode="Nearest")``; SURVEY.md §2.9 row 1) and of
the vertex→depth splatting inside project_new_depth_with_new_pose
(models/utils.py:354-380).

Implementation: nearest-target scatter with min-z collision resolve,
expressed as XLA scatter-min over a flattened target (TPUs dislike scatter,
but this op is off the training/serving hot path — it exists for pose
editing and depth reprojection; the gather-based inverse formulation is used
everywhere performance matters, per SURVEY.md §7).
"""

from __future__ import annotations

import jax.numpy as jnp


def forward_splat_nearest(src: jnp.ndarray, flow: jnp.ndarray,
                          z: jnp.ndarray | None = None) -> jnp.ndarray:
    """Splat each source pixel to (p + flow[p]), nearest-neighbor.

    Args:
      src: [B, H, W, C] source image.
      flow: [B, H, W, 2] (dx, dy) pixel displacements.
      z: optional [B, H, W] per-pixel depth for collision resolve
         (smallest z wins).  Without z, collisions resolve arbitrarily but
         deterministically (lowest source index wins).

    Returns [B, H, W, C]; un-hit pixels are 0.
    """
    b, h, w, c = src.shape
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    tx = jnp.round(xs[None] + flow[..., 0]).astype(jnp.int32)
    ty = jnp.round(ys[None] + flow[..., 1]).astype(jnp.int32)
    valid = (tx >= 0) & (tx < w) & (ty >= 0) & (ty < h)
    flat_idx = jnp.where(valid, ty * w + tx, h * w)  # overflow bucket

    if z is None:
        z = jnp.broadcast_to(
            jnp.arange(h * w, dtype=jnp.float32).reshape(1, h, w), (b, h, w))
    z = jnp.where(valid, z, jnp.inf)

    def one(src_b, idx_b, z_b):
        idx = idx_b.reshape(-1)
        # winner-take-all: scatter-min z, then scatter values where z matches
        zbuf = jnp.full((h * w + 1,), jnp.inf).at[idx].min(z_b.reshape(-1))
        won = z_b.reshape(-1) == zbuf[idx]
        out = jnp.zeros((h * w + 1, c), src_b.dtype)
        vals = jnp.where(won[:, None], src_b.reshape(-1, c), 0.0)
        # 'max' keeps the winning value; losers contribute 0 (un-hit stay 0)
        out = out.at[idx].max(vals)
        return out[:h * w].reshape(h, w, c)

    import jax
    return jax.vmap(one)(src, flat_idx, z)


def splat_depth(points_xy: jnp.ndarray, z: jnp.ndarray, height: int,
                width: int) -> jnp.ndarray:
    """Splat a point set's depth to a [H, W] z-buffer (min-z), the vertex-
    splat part of the reference's lin_interp input (models/utils.py:343-352);
    densification is done by the mesh rasterizer instead (ops/rasterize)."""
    x = jnp.round(points_xy[:, 0]).astype(jnp.int32)
    y = jnp.round(points_xy[:, 1]).astype(jnp.int32)
    valid = (x >= 0) & (x < width) & (y >= 0) & (y < height) & (z > 0)
    idx = jnp.where(valid, y * width + x, height * width)
    zv = jnp.where(valid, z, jnp.inf)
    zbuf = jnp.full((height * width + 1,), jnp.inf).at[idx].min(zv)
    zbuf = jnp.where(jnp.isfinite(zbuf), zbuf, 0.0)
    return zbuf[:height * width].reshape(height, width)
