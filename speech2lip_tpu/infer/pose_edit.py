"""Controllable head-pose editing at inference.

Equivalent of the reference's controllable path (reference
inference.py --change_pose + models/utils.py:171-273
``sample_rel_pose_from_can2obs`` / ``forward_warping_controllable`` — the
one consumer of the Forward-Warp CUDA package, SURVEY.md §2.9 row 1):
render the canonical-space face, then forward-splat it into a novel head
pose using the learned canonical depth.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from speech2lip_tpu.ops.geometry import (backproject_depth, intrinsics,
                                         pose_matrix, project_3d)
from speech2lip_tpu.ops.splat import forward_splat_nearest


def edited_rel_pose(canonical_euler, canonical_trans, edit: str, index: int,
                    value: float):
    """T(edited) @ inv(T_canonical): replace one euler/trans component of the
    canonical pose (reference sample_rel_pose_from_can2obs,
    models/utils.py:171-184)."""
    euler = jnp.asarray(canonical_euler)[None].copy()
    trans = jnp.asarray(canonical_trans)[None].copy()
    if edit == "euler":
        euler = euler.at[0, index].set(value)
    elif edit == "trans":
        trans = trans.at[0, index].set(value)
    else:
        raise ValueError(edit)
    t_can = pose_matrix(jnp.asarray(canonical_euler)[None],
                        jnp.asarray(canonical_trans)[None])[0]
    t_new = pose_matrix(euler, trans)[0]
    return t_new @ jnp.linalg.inv(t_can)


def render_pose_edited_batch(params, unet_params, unet_state, batch,
                             *, lip_x: int, lip_y: int, lip_h: int,
                             lip_w: int, focal: float, edit: str,
                             axis: int, value: float,
                             compute_dtype=jnp.float32):
    """Controllable inference: render the lip, paste into the canonical
    face, forward-splat the canonical composite into an EDITED head pose
    (one euler/trans component replaced by ``value``), then U-Net refine.

    This is the working version of the reference's --change_pose surface
    (inference.py:59,128,169): there the flag is parsed and passed down but
    every consumer drops it — post_fusion2_onlylip ignores it on the
    use_light_unet path every shipped config takes (tf_nerf.py:287-305), and
    the dataset never stores it (someones_lip_dataset.py:19).  The intended
    machinery lives in models/utils.py:171-273
    (sample_rel_pose_from_can2obs + forward_warping_controllable, the
    Forward-Warp CUDA consumer) — reproduced here with ops/splat.

    batch: the standard sample dict (audio, index, rgb_face_zero,
    mask_lip_canonical, canonical_euler, canonical_trans).
    Returns [B, H, W, 3] pose-edited faces.
    """
    import jax
    from speech2lip_tpu.infer.renderer import render_lip_batch
    from speech2lip_tpu.models import talking_face as tf_model
    from speech2lip_tpu.models import unet_light

    rgb_lip = render_lip_batch(params, batch["audio"],
                               batch["index"].astype(jnp.float32),
                               lip_h, lip_w, compute_dtype=compute_dtype)
    merged = tf_model.paste_lip(rgb_lip,
                                batch["rgb_face_zero"].astype(rgb_lip.dtype),
                                batch["mask_lip_canonical"].astype(
                                    rgb_lip.dtype),
                                lip_x, lip_y)
    depth = params["canonical_depth"].astype(jnp.float32)

    def one(img, can_euler, can_trans):
        rel = edited_rel_pose(can_euler, can_trans, edit, axis, value)
        return forward_warp_to_pose(img.astype(jnp.float32), depth, rel,
                                    focal)

    warped = jax.vmap(one)(merged, batch["canonical_euler"],
                           batch["canonical_trans"])
    face, _ = unet_light.apply(unet_params, unet_state,
                               warped.astype(compute_dtype), train=False)
    return face.astype(jnp.float32)


def forward_warp_to_pose(canonical_img: jnp.ndarray,
                         canonical_depth: jnp.ndarray,
                         rel_pose: jnp.ndarray, focal: float) -> jnp.ndarray:
    """Forward-splat a canonical-space image into a new pose.

    canonical_img: [H, W, 3]; canonical_depth: [H, W] (the learned
    canonical_depth param); rel_pose: [4, 4] canonical→target.

    Replaces forward_warping_controllable (models/utils.py:228-273): project
    each canonical pixel with its depth into the target view, nearest-splat
    with min-z occlusion resolve (ops/splat).
    """
    h, w = canonical_depth.shape
    k = jnp.asarray(intrinsics(focal, h, w))
    inv_k = jnp.linalg.inv(k)
    cam = backproject_depth(canonical_depth, inv_k)
    grid, z = project_3d(cam, k, rel_pose, h, w)
    # grid is in [-1,1]; convert to pixel displacements for the splat
    tx = (grid[..., 0] / 2.0 + 0.5) * (w - 1)
    ty = (grid[..., 1] / 2.0 + 0.5) * (h - 1)
    xs, ys = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32), indexing="xy")
    flow = jnp.stack([tx - xs, ty - ys], axis=-1)
    valid = canonical_depth > 0
    zmask = jnp.where(valid, z, jnp.inf)
    return forward_splat_nearest(
        (canonical_img * valid[..., None])[None], flow[None], zmask[None])[0]
