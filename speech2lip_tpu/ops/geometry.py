"""Rigid-pose and pinhole-projection geometry.

JAX equivalents of the reference's pose/warp helpers
(reference src/face_simple/models/utils.py:8-169): euler→rotation, the
sign-flipped transform-matrix builder, depth backprojection and pinhole
projection used by the canonical-depth photometric loss
(reference src/face_simple/training.py:296-314).

Everything is expressed as small batched matmuls over static-shape pixel
grids so it jits into a handful of XLA ops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def euler2rot(euler: jnp.ndarray) -> jnp.ndarray:
    """[B, 3] euler angles (theta, phi, psi) -> [B, 3, 3] rotation.

    Matches reference models/utils.py:8-34: R = Rx @ Ry @ Rz with the same
    (transposed-looking) per-axis conventions.
    """
    theta, phi, psi = euler[:, 0], euler[:, 1], euler[:, 2]
    one = jnp.ones_like(theta)
    zero = jnp.zeros_like(theta)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    cs, ss = jnp.cos(psi), jnp.sin(psi)
    # the torch code cats column vectors along dim=1 then stacks columns
    # along dim=2; the outer jnp.stack(..., -1) likewise builds columns
    rot_x = jnp.stack([
        jnp.stack([one, zero, zero], -1),
        jnp.stack([zero, ct, st], -1),
        jnp.stack([zero, -st, ct], -1),
    ], -1)  # [B, 3, 3]
    rot_y = jnp.stack([
        jnp.stack([cp, zero, -sp], -1),
        jnp.stack([zero, one, zero], -1),
        jnp.stack([sp, zero, cp], -1),
    ], -1)
    rot_z = jnp.stack([
        jnp.stack([cs, -ss, zero], -1),
        jnp.stack([ss, cs, zero], -1),
        jnp.stack([zero, zero, one], -1),
    ], -1)
    return rot_x @ rot_y @ rot_z


def pose_matrix(euler: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """[B,3] euler + [B,3] trans -> [B,4,4] camera transform.

    Matches reference prepare_transform_matrix (models/utils.py:36-52)
    including the sign flips on components 1 and 2 of both euler and trans.
    """
    flip = jnp.array([1.0, -1.0, -1.0], euler.dtype)
    rot = euler2rot(euler * flip)  # [B,3,3]
    t = (trans * flip)[..., None]  # [B,3,1]
    top = jnp.concatenate([rot, t], axis=-1)  # [B,3,4]
    bottom = jnp.broadcast_to(
        jnp.array([[0.0, 0.0, 0.0, 1.0]], euler.dtype), (euler.shape[0], 1, 4))
    return jnp.concatenate([top, bottom], axis=1)


def rel_pose_can2obs(canonical_euler, canonical_trans, euler, trans):
    """T_obs @ inv(T_canonical)  (reference training.py:263-268)."""
    t_can = pose_matrix(canonical_euler, canonical_trans)
    t_obs = pose_matrix(euler, trans)
    return t_obs @ jnp.linalg.inv(t_can)


def rel_pose_obs2can(canonical_euler, canonical_trans, euler, trans):
    """inv(T_obs @ inv(T_canonical))  (reference training.py:270-275)."""
    return jnp.linalg.inv(
        rel_pose_can2obs(canonical_euler, canonical_trans, euler, trans))


def intrinsics(focal: float, height: int, width: int) -> np.ndarray:
    """4x4 K matrix with principal point at the image center
    (reference training.py:108-112)."""
    return np.array([
        [focal, 0.0, width / 2.0, 0.0],
        [0.0, focal, height / 2.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ], dtype=np.float32)


def backproject_depth(depth: jnp.ndarray, inv_k: jnp.ndarray) -> jnp.ndarray:
    """Depth image -> homogeneous camera-space points.

    Args:
      depth: [H, W];  inv_k: [4, 4].
    Returns:
      [4, H*W] points (x, y, z, 1) — reference BackprojectDepth
      (models/utils.py:115-143).
    """
    h, w = depth.shape
    xs, ys = jnp.meshgrid(jnp.arange(w, dtype=depth.dtype),
                          jnp.arange(h, dtype=depth.dtype), indexing="xy")
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1),
                     jnp.ones(h * w, depth.dtype)], axis=0)  # [3, HW]
    cam = inv_k[:3, :3] @ pix
    cam = depth.reshape(1, -1) * cam
    ones = jnp.ones((1, h * w), depth.dtype)
    return jnp.concatenate([cam, ones], axis=0)


def project_3d(points: jnp.ndarray, k: jnp.ndarray, t: jnp.ndarray,
               height: int, width: int, eps: float = 1e-7):
    """Project homogeneous points into a camera, returning a grid-sample grid.

    Args:
      points: [4, H*W];  k, t: [4, 4].
    Returns:
      (grid [H, W, 2] in [-1, 1] torch grid_sample convention,
       z [H, W] camera-space depth) — reference Project3D
      (models/utils.py:145-169).
    """
    p = (k @ t)[:3, :]
    cam = p @ points  # [3, HW]
    z = cam[2]
    pix = cam[:2] / (z[None, :] + eps)  # [2, HW]
    pix = pix.reshape(2, height, width)
    gx = pix[0] / (width - 1)
    gy = pix[1] / (height - 1)
    grid = jnp.stack([(gx - 0.5) * 2.0, (gy - 0.5) * 2.0], axis=-1)
    return grid, z.reshape(height, width)


def warp_grid_crop(depth: jnp.ndarray, rel_pose: jnp.ndarray,
                   k: jnp.ndarray, inv_k: jnp.ndarray, box,
                   height: int, width: int) -> jnp.ndarray:
    """The elementwise part of ``inverse_warp`` — backproject + project —
    restricted to a static crop of the TARGET plane, without the gather.

    Per-pixel math identical to ``backproject_depth``/``project_3d`` (each
    pixel is an independent column through the same 3×3 contractions), so
    grid values equal the full-frame path's at the crop pixels exactly.
    Used by the canonical-depth loss fast path: the loss mask's support is
    a static per-identity box, so only that box's warp is ever needed.

    Args:
      depth: [H, W] full-frame target depth; rel_pose/k/inv_k: [4, 4];
      box: (x0, x1, y0, y1) half-open pixel bounds, static ints.
    Returns:
      grid [y1-y0, x1-x0, 2] in [-1, 1] normalized to (height, width).
    """
    x0, x1, y0, y1 = box
    ch, cw = y1 - y0, x1 - x0
    d = depth[y0:y1, x0:x1]
    xs, ys = jnp.meshgrid(jnp.arange(x0, x1, dtype=depth.dtype),
                          jnp.arange(y0, y1, dtype=depth.dtype),
                          indexing="xy")
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1),
                     jnp.ones(ch * cw, depth.dtype)], axis=0)
    cam = inv_k[:3, :3] @ pix
    cam = d.reshape(1, -1) * cam
    points = jnp.concatenate(
        [cam, jnp.ones((1, ch * cw), depth.dtype)], axis=0)
    p = (k @ rel_pose)[:3, :]
    c2 = p @ points
    z = c2[2]
    pixp = c2[:2] / (z[None, :] + 1e-7)
    gx = pixp[0] / (width - 1)
    gy = pixp[1] / (height - 1)
    grid = jnp.stack([(gx - 0.5) * 2.0, (gy - 0.5) * 2.0], axis=-1)
    return grid.reshape(ch, cw, 2)


def warp_grid_points(depth_pts: jnp.ndarray, xs: jnp.ndarray,
                     ys: jnp.ndarray, rel_pose: jnp.ndarray,
                     k: jnp.ndarray, inv_k: jnp.ndarray,
                     height: int, width: int,
                     eps: float = 1e-7) -> jnp.ndarray:
    """``backproject_depth`` + ``project_3d`` restricted to S target
    pixels (the canonical-depth loss only ever reads the warp at its
    mask's support — a per-identity constant point set).

    Per-point math is identical to the full-frame pair: every pixel is an
    independent column through the same 3×3 contractions, so grid values
    equal the full-frame path's at (ys, xs) exactly.

    Args:
      depth_pts: [S] target depth at the points; xs/ys: [S] pixel indices
      (int or float); rel_pose/k/inv_k: [4, 4].
    Returns:
      grid [S, 2] in [-1, 1] normalized to (height, width).
    """
    dt = depth_pts.dtype
    s = depth_pts.shape[0]
    pix = jnp.stack([xs.astype(dt), ys.astype(dt), jnp.ones((s,), dt)],
                    axis=0)                                   # [3, S]
    cam = inv_k[:3, :3].astype(dt) @ pix
    cam = depth_pts[None, :] * cam
    points = jnp.concatenate([cam, jnp.ones((1, s), dt)], axis=0)
    p = (k @ rel_pose)[:3, :].astype(dt)
    cam2 = p @ points                                         # [3, S]
    z = cam2[2]
    pix2 = cam2[:2] / (z[None, :] + eps)
    gx = pix2[0] / (width - 1)
    gy = pix2[1] / (height - 1)
    return jnp.stack([(gx - 0.5) * 2.0, (gy - 0.5) * 2.0], axis=-1)


def inverse_warp(src_img: jnp.ndarray, tgt_depth: jnp.ndarray,
                 rel_pose: jnp.ndarray, k: jnp.ndarray, inv_k: jnp.ndarray):
    """Backward-warp ``src_img`` into the target view given target depth.

    Args:
      src_img: [H, W, C]; tgt_depth: [H, W]; rel_pose/k/inv_k: [4, 4].
    Returns:
      (warped [H, W, C], z [H, W]) — reference Trainer.inverse_warping
      (training.py:296-314, grid_sample padding_mode='border').
    """
    from speech2lip_tpu.ops.grid_sample import grid_sample
    h, w = tgt_depth.shape
    cam = backproject_depth(tgt_depth, inv_k)
    grid, z = project_3d(cam, k, rel_pose, h, w)
    warped = grid_sample(src_img[None], grid[None], padding_mode="border")[0]
    return warped, z
