"""Tile-based triangle rasterizer (pure XLA, static shapes).

TPU-native replacement for pytorch3d's mesh rasterizer (SURVEY.md §2.9
"pytorch3d" row; used by the reference's differentiable 3DMM renderer,
reference preprocess/face_tracking/render_3dmm.py:108-146, and — indirectly,
as scipy Delaunay densification of splatted vertices — by the depth-map
steps, face_tracker.py:76-85,661-717).

Design (SURVEY.md §7 hard-parts): binning + per-tile brute force.
1. faces → screen-space bboxes → up to EXPAND×EXPAND covered tiles each;
2. (tile, face) pairs sorted by tile id (one global sort, MXU-friendly);
3. per tile: barycentric inside-tests of ≤ max_faces_per_tile faces against
   the tile's pixels, z-buffer argmin — a dense [pixels × faces] compute
   block that vectorizes on the VPU;
4. gradients: rasterization outputs (pix_to_face, barycentrics) are integer/
   fixed correspondences; differentiable shading re-interpolates vertex
   attributes at those fixed pixels (the re-rasterize design from SURVEY.md
   §7), matching how the tracker uses gradients (through shading values,
   not visibility).

Conventions: verts are in *pixel* coordinates (x right, y down) with z the
camera-space depth (nearest = smallest z > z_near); z interpolates linearly
in screen space (pytorch3d perspective_correct=False, render_3dmm.py:130).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Fragments(NamedTuple):
    pix_to_face: jnp.ndarray  # [H, W] int32, -1 = background
    bary: jnp.ndarray         # [H, W, 3] float32
    zbuf: jnp.ndarray         # [H, W] float32, +inf = background
    # scalar int32: total (tile, face) pairs silently dropped because a
    # tile's bin exceeded max_faces_per_tile.  0 means the raster is exact;
    # nonzero means K must be raised (checked by preprocess CLI in debug).
    overflow: jnp.ndarray = 0


def _edge(ax, ay, bx, by, px, py):
    return (px - ax) * (by - ay) - (py - ay) * (bx - ax)


@functools.partial(jax.jit, static_argnames=("height", "width", "tile",
                                             "max_faces_per_tile", "expand",
                                             "chunk"))
def rasterize(verts: jnp.ndarray, tris: jnp.ndarray, height: int, width: int,
              tile: int = 16, max_faces_per_tile: int = 128,
              expand: int = 4, chunk: int = 64,
              z_near: float = 1e-4) -> Fragments:
    """Rasterize a triangle mesh to per-pixel face ids + barycentrics.

    Args:
      verts: [V, 3] (x_px, y_px, z_cam).
      tris:  [F, 3] int vertex indices.
      tile: square tile edge in pixels (image dims padded up to multiples).
      max_faces_per_tile: static cap K of faces tested per tile; overflow
        faces are dropped (sorted arbitrarily) — raise for dense meshes.
      expand: max tiles per axis a face's bbox may cover (bigger faces are
        clamped; at 3DMM face scale (~70k faces on 500²) faces are tiny).
      chunk: tiles processed per sequential step (memory/speed dial).
    """
    v = verts.astype(jnp.float32)
    f = tris.astype(jnp.int32)
    n_faces = f.shape[0]
    tiles_x = -(-width // tile)
    tiles_y = -(-height // tile)
    n_tiles = tiles_x * tiles_y

    v0 = v[f[:, 0]]
    v1 = v[f[:, 1]]
    v2 = v[f[:, 2]]

    # face → tile bins
    min_x = jnp.minimum(jnp.minimum(v0[:, 0], v1[:, 0]), v2[:, 0])
    max_x = jnp.maximum(jnp.maximum(v0[:, 0], v1[:, 0]), v2[:, 0])
    min_y = jnp.minimum(jnp.minimum(v0[:, 1], v1[:, 1]), v2[:, 1])
    max_y = jnp.maximum(jnp.maximum(v0[:, 1], v1[:, 1]), v2[:, 1])
    behind = (v0[:, 2] <= z_near) | (v1[:, 2] <= z_near) | (v2[:, 2] <= z_near)
    offscreen = (max_x < 0) | (min_x > width - 1) | (max_y < 0) | (min_y > height - 1)
    dead = behind | offscreen

    tx0 = jnp.clip(jnp.floor(min_x / tile), 0, tiles_x - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(max_x / tile), 0, tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(min_y / tile), 0, tiles_y - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(max_y / tile), 0, tiles_y - 1).astype(jnp.int32)

    # static EXPAND×EXPAND tile slots per face
    di = jnp.arange(expand)
    gx = tx0[:, None] + di[None, :]                  # [F, E]
    gy = ty0[:, None] + di[None, :]
    valid_x = gx <= tx1[:, None]
    valid_y = gy <= ty1[:, None]
    tile_ids = (gy[:, :, None] * tiles_x + gx[:, None, :])  # [F, E, E]
    valid = (valid_y[:, :, None] & valid_x[:, None, :]
             & ~dead[:, None, None])
    tile_ids = jnp.where(valid, tile_ids, n_tiles)   # overflow bucket
    flat_tiles = tile_ids.reshape(-1)                # [F*E*E]
    flat_faces = jnp.broadcast_to(
        jnp.arange(n_faces, dtype=jnp.int32)[:, None, None],
        tile_ids.shape).reshape(-1)

    order = jnp.argsort(flat_tiles)
    sorted_tiles = flat_tiles[order]
    sorted_faces = flat_faces[order]
    starts = jnp.searchsorted(sorted_tiles, jnp.arange(n_tiles))
    # overflow accounting: bin sizes beyond K are silently dropped by the
    # dynamic_slice below, so surface the total dropped count to the caller
    ends = jnp.searchsorted(sorted_tiles, jnp.arange(1, n_tiles + 1))
    overflow = jnp.sum(jnp.maximum(ends - starts - max_faces_per_tile, 0))

    k = max_faces_per_tile
    px_base = jnp.arange(tile, dtype=jnp.float32)

    def raster_tile(t_idx):
        start = starts[t_idx]
        faces_k = jax.lax.dynamic_slice(sorted_faces, (start,), (k,))
        tiles_k = jax.lax.dynamic_slice(sorted_tiles, (start,), (k,))
        alive = tiles_k == t_idx

        a = v0[faces_k]   # [K, 3]
        b = v1[faces_k]
        c = v2[faces_k]

        ty, tx = t_idx // tiles_x, t_idx % tiles_x
        px = tx * tile + px_base                      # [tile]
        py = ty * tile + px_base
        pxx = jnp.broadcast_to(px[None, :], (tile, tile)).reshape(-1)
        pyy = jnp.broadcast_to(py[:, None], (tile, tile)).reshape(-1)

        # edge functions: [P, K]
        w0 = _edge(b[:, 0], b[:, 1], c[:, 0], c[:, 1],
                   pxx[:, None], pyy[:, None])
        w1 = _edge(c[:, 0], c[:, 1], a[:, 0], a[:, 1],
                   pxx[:, None], pyy[:, None])
        w2 = _edge(a[:, 0], a[:, 1], b[:, 0], b[:, 1],
                   pxx[:, None], pyy[:, None])
        area = _edge(a[:, 0], a[:, 1], b[:, 0], b[:, 1], c[:, 0], c[:, 1])
        denom = jnp.where(jnp.abs(area) < 1e-12, 1.0, area)[None, :]
        b0 = w0 / denom
        b1 = w1 / denom
        b2 = w2 / denom
        inside = ((b0 >= 0) & (b1 >= 0) & (b2 >= 0)
                  & (jnp.abs(area)[None, :] > 1e-12) & alive[None, :])
        z = b0 * a[:, 2][None] + b1 * b[:, 2][None] + b2 * c[:, 2][None]
        z = jnp.where(inside & (z > z_near), z, jnp.inf)

        best = jnp.argmin(z, axis=1)                  # [P]
        pr = jnp.arange(tile * tile)
        zbest = z[pr, best]
        hit = jnp.isfinite(zbest)
        face_id = jnp.where(hit, faces_k[best], -1)
        bary = jnp.stack([b0[pr, best], b1[pr, best], b2[pr, best]], -1)
        bary = jnp.where(hit[:, None], bary, 0.0)
        return (face_id.reshape(tile, tile),
                bary.reshape(tile, tile, 3),
                jnp.where(hit, zbest, jnp.inf).reshape(tile, tile))

    tile_idx = jnp.arange(n_tiles)
    face_t, bary_t, z_t = jax.lax.map(jax.vmap(raster_tile),
                                      tile_idx.reshape(-1, chunk)
                                      if n_tiles % chunk == 0 else
                                      tile_idx.reshape(n_tiles, 1))
    face_t = face_t.reshape(tiles_y, tiles_x, tile, tile)
    bary_t = bary_t.reshape(tiles_y, tiles_x, tile, tile, 3)
    z_t = z_t.reshape(tiles_y, tiles_x, tile, tile)

    img_face = face_t.transpose(0, 2, 1, 3).reshape(tiles_y * tile,
                                                    tiles_x * tile)
    img_bary = bary_t.transpose(0, 2, 1, 3, 4).reshape(
        tiles_y * tile, tiles_x * tile, 3)
    img_z = z_t.transpose(0, 2, 1, 3).reshape(tiles_y * tile, tiles_x * tile)
    return Fragments(img_face[:height, :width],
                     img_bary[:height, :width],
                     img_z[:height, :width],
                     overflow.astype(jnp.int32))


def check_raster_budget(verts, tris, height: int, width: int,
                        **raster_kwargs) -> int:
    """Rasterize once and return the dropped-face count (0 = budget OK).

    Run this on a representative frame before a long tracking/warping run:
    a nonzero result means ``max_faces_per_tile`` is too small for this
    mesh density and depths/visibility would be silently wrong
    (VERDICT r1 weak #9).
    """
    frag = rasterize(jnp.asarray(verts), jnp.asarray(tris), height, width,
                     **raster_kwargs)
    return int(frag.overflow)


def recompute_barycentrics(pix_to_face: jnp.ndarray, verts: jnp.ndarray,
                           tris: jnp.ndarray) -> jnp.ndarray:
    """Differentiably recompute barycentrics at fixed visibility.

    ``pix_to_face`` is treated as a constant correspondence map (visibility
    from the last rasterization); the barycentric weights are re-derived
    from the *current* projected vertices, so gradients w.r.t. vertex
    positions (pose/expression in the 3DMM tracker) flow through the
    reprojection — the fixed-visibility differentiable-rendering scheme
    replacing pytorch3d's soft rasterizer gradients (SURVEY.md §7).
    """
    h, w = pix_to_face.shape
    face = jnp.maximum(pix_to_face, 0)
    fv = tris[face]                          # [H, W, 3]
    a = verts[fv[..., 0]]                    # [H, W, 3] (x, y, z)
    b = verts[fv[..., 1]]
    c = verts[fv[..., 2]]
    px = jnp.broadcast_to(jnp.arange(w, dtype=verts.dtype)[None, :], (h, w))
    py = jnp.broadcast_to(jnp.arange(h, dtype=verts.dtype)[:, None], (h, w))
    w0 = _edge(b[..., 0], b[..., 1], c[..., 0], c[..., 1], px, py)
    w1 = _edge(c[..., 0], c[..., 1], a[..., 0], a[..., 1], px, py)
    w2 = _edge(a[..., 0], a[..., 1], b[..., 0], b[..., 1], px, py)
    area = _edge(a[..., 0], a[..., 1], b[..., 0], b[..., 1],
                 c[..., 0], c[..., 1])
    denom = jnp.where(jnp.abs(area) < 1e-12, 1.0, area)
    return jnp.stack([w0, w1, w2], -1) / denom[..., None]


def interpolate_attributes(frag: Fragments, tris: jnp.ndarray,
                           vert_attrs: jnp.ndarray,
                           background=0.0) -> jnp.ndarray:
    """Differentiable shading: per-pixel barycentric blend of vertex
    attributes at the rasterized correspondences.

    vert_attrs: [V, C].  Gradients flow to ``vert_attrs`` (colors, lighting)
    — visibility is fixed, matching the tracker's use of gradients
    (reference render_3dmm.py forward + face_tracker.py photometric phases).
    """
    face = jnp.maximum(frag.pix_to_face, 0)
    fv = tris[face]                       # [H, W, 3]
    attrs = vert_attrs[fv]                # [H, W, 3, C]
    out = jnp.sum(frag.bary[..., None] * attrs, axis=2)
    hit = (frag.pix_to_face >= 0)[..., None]
    return jnp.where(hit, out, background)
