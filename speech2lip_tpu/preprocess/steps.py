"""Preprocessing pipeline steps (STEP0, STEP3–STEP6).

TPU-native rebuilds of the reference's offline dataset-construction graph
(reference preprocess/preprocess_may.sh, call stack SURVEY.md §3.3):

  crop_face           — STEP0 fixed-window face crop (crop_face.py:90-118)
  mesh_depth          — z-buffer depth from the posed 3DMM mesh; replaces
                        scipy LinearNDInterpolator densification of splatted
                        vertices (face_tracker.py:76-85) with exact
                        rasterized depth (ops/rasterize)
  warp_images         — STEP3: warp every observed frame into the canonical
                        pose (face_tracker.py:661-717)
  compute_uv_mapping  — STEP4: per-frame observed→canonical coord grids
                        (face_tracker.py:535-611)
  canonical_masks     — STEP5: canonical depth/face mask (+ head mask from a
                        parsing map) (face_tracker.py:613-659)
  crop_lip            — STEP6: mouth bbox + lip crops (face_tracker.py:730-772)

All warps are batched jitted XLA programs over the frame axis.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from speech2lip_tpu.ops.geometry import (backproject_depth, intrinsics,
                                         pose_matrix, project_3d)
from speech2lip_tpu.ops.grid_sample import grid_sample
from speech2lip_tpu.ops.rasterize import rasterize
from speech2lip_tpu.preprocess import face_3dmm as bfm


def crop_face(frame: np.ndarray, center_xy: Tuple[int, int],
              size: int = 500) -> np.ndarray:
    """Fixed-window square crop around a hand-picked center
    (reference crop_face.py:90-118)."""
    cx, cy = center_xy
    half = size // 2
    y0, x0 = cy - half, cx - half
    return frame[y0:y0 + size, x0:x0 + size]


def mesh_depth(assets: bfm.BFMAssets, id_para, exp_para, euler, trans,
               focal: float, height: int, width: int,
               **raster_kwargs) -> jnp.ndarray:
    """[B, H, W] z-buffer depth of the posed mesh (0 where no face).

    Matches the reference's lin_interp(proj_pts with z := −Z) semantics
    (face_tracker.py:588-599) with exact triangle interpolation instead of
    Delaunay densification of vertex splats.
    """
    geo = bfm.forward_geo(assets, id_para, exp_para)
    rott = bfm.rot_trans_pts(geo, bfm.euler2rot(euler), trans)
    cxy = (width / 2.0, height / 2.0)
    pix = bfm.proj_pts(rott, focal, cxy)
    pix = pix.at[:, :, 2].multiply(-1.0)  # BFM camera looks down -z

    def one(pix_b):
        frag = rasterize(pix_b, assets.tris, height, width, **raster_kwargs)
        return jnp.where(jnp.isfinite(frag.zbuf), frag.zbuf, 0.0)

    return jax.vmap(one)(pix)


def _warp_grid_from_depth(depth, k, inv_k, t_rel, height, width):
    cam = backproject_depth(depth, inv_k)
    grid, _ = project_3d(cam, k, t_rel, height, width)
    return grid


def warp_images(track: Dict[str, np.ndarray], assets: bfm.BFMAssets,
                frames: np.ndarray, canonical_idx: int,
                height: int, width: int,
                **raster_kwargs) -> np.ndarray:
    """STEP3: warp each observed frame into the canonical pose, masked by
    the canonical face region (face_tracker.py:661-717).

    frames: [N, H, W, 3] float RGB in [0, 255] or [0, 1].
    """
    focal = float(track["focal"])
    k = jnp.asarray(intrinsics(focal, height, width))
    inv_k = jnp.asarray(np.linalg.pinv(np.asarray(k)))
    id_p = jnp.asarray(track["id"])
    exp = jnp.asarray(track["exp"])
    euler = jnp.asarray(track["euler"])
    trans = jnp.asarray(track["trans"])

    can_depth = mesh_depth(assets, id_p, exp[canonical_idx:canonical_idx + 1],
                           euler[canonical_idx:canonical_idx + 1],
                           trans[canonical_idx:canonical_idx + 1],
                           focal, height, width, **raster_kwargs)[0]
    t_can = pose_matrix(euler[canonical_idx:canonical_idx + 1],
                        trans[canonical_idx:canonical_idx + 1])[0]
    face_mask = (can_depth > 0).astype(jnp.float32)[..., None]

    @jax.jit
    def warp_one(img, e, t):
        t_rel = pose_matrix(e[None], t[None])[0] @ jnp.linalg.inv(t_can)
        grid = _warp_grid_from_depth(can_depth, k, inv_k, t_rel,
                                     height, width)
        warped = grid_sample(img[None], grid[None])[0]
        return warped * face_mask

    out = [np.asarray(warp_one(jnp.asarray(frames[i], jnp.float32),
                               euler[i], trans[i]))
           for i in range(frames.shape[0])]
    return np.stack(out)


def compute_uv_mapping(track: Dict[str, np.ndarray], assets: bfm.BFMAssets,
                       canonical_idx: int, height: int, width: int,
                       n_frames: Optional[int] = None,
                       **raster_kwargs) -> np.ndarray:
    """STEP4: per-frame observed→canonical backward-warp grids in [-1, 1]
    (the coords/%05d.npy contract; face_tracker.py:535-611)."""
    focal = float(track["focal"])
    k = jnp.asarray(intrinsics(focal, height, width))
    inv_k = jnp.asarray(np.linalg.pinv(np.asarray(k)))
    id_p = jnp.asarray(track["id"])
    exp = jnp.asarray(track["exp"])
    euler = jnp.asarray(track["euler"])
    trans = jnp.asarray(track["trans"])
    n = n_frames or exp.shape[0]

    t_can = pose_matrix(euler[canonical_idx:canonical_idx + 1],
                        trans[canonical_idx:canonical_idx + 1])[0]

    @jax.jit
    def one(exp_i, e, t):
        depth = mesh_depth(assets, id_p, exp_i[None], e[None], t[None],
                           focal, height, width, **raster_kwargs)[0]
        t_rel = t_can @ jnp.linalg.inv(pose_matrix(e[None], t[None])[0])
        grid = _warp_grid_from_depth(depth, k, inv_k, t_rel, height, width)
        return jnp.clip(grid, -1.0, 1.0)

    return np.stack([np.asarray(one(exp[i], euler[i], trans[i]))
                     for i in range(n)])


def canonical_masks(track: Dict[str, np.ndarray], assets: bfm.BFMAssets,
                    canonical_idx: int, height: int, width: int,
                    parsing_map: Optional[np.ndarray] = None,
                    **raster_kwargs):
    """STEP5: canonical depth + face mask (+ head mask decoded from a
    BiSeNet-style parsing color map) (face_tracker.py:613-659).

    Returns (depth [H, W], face_mask [H, W] bool, head_mask or None).
    """
    id_p = jnp.asarray(track["id"])
    exp = jnp.asarray(track["exp"])
    euler = jnp.asarray(track["euler"])
    trans = jnp.asarray(track["trans"])
    depth = mesh_depth(assets, id_p, exp[canonical_idx:canonical_idx + 1],
                       euler[canonical_idx:canonical_idx + 1],
                       trans[canonical_idx:canonical_idx + 1],
                       float(track["focal"]), height, width,
                       **raster_kwargs)[0]
    depth = np.asarray(depth)
    face_mask = depth > 0
    head_mask = None
    if parsing_map is not None:
        # red-coded head region (face_tracker.py:653-656, BGR order there)
        head_mask = ((parsing_map[:, :, 0] >= 200)
                     & (parsing_map[:, :, 1] <= 50)
                     & (parsing_map[:, :, 2] <= 50))
    return depth, face_mask, head_mask


def mouth_bbox_from_landmarks(lms: np.ndarray, dst_w: int, dst_h: int,
                              center_y_ratio: float = 1.02):
    """Fixed-size mouth box from canonical landmarks 48+
    (face_tracker.py:739-758; same math as data.dataset.compute_mouth_bbox)."""
    from speech2lip_tpu.data.dataset import compute_mouth_bbox
    return compute_mouth_bbox(lms, dst_w, dst_h, center_y_ratio)


def crop_lip(warped_frames: np.ndarray, lms_canonical: np.ndarray,
             dst_w: int, dst_h: int, center_y_ratio: float = 1.02):
    """STEP6: lip mask + per-frame lip crops from the canonical-space faces
    (face_tracker.py:730-772).

    Returns (crops [N, dst_h, dst_w, 3], lip_mask [H, W], (x, y))."""
    x, y, w, h = mouth_bbox_from_landmarks(lms_canonical, dst_w, dst_h,
                                           center_y_ratio)
    H, W = warped_frames.shape[1:3]
    mask = np.zeros((H, W), np.uint8)
    mask[y:y + h, x:x + w] = 255
    crops = warped_frames[:, y:y + h, x:x + w, :]
    return crops, mask, (x, y)
