"""Basel Face Model (3DMM) linear blend + differentiable SH-lit rendering.

JAX equivalents of the reference's ``Face_3DMM``
(reference preprocess/face_tracking/facemodel.py:8-121), the projection
helpers (face_tracking/util.py:18-99 — note the negated-x pinhole in
``proj_pts``), vertex normals + 9-term spherical-harmonics illumination
(render_3dmm.py:98-106,187-225), and the mesh renderer (replaced by the
tile rasterizer in ops/rasterize.py).

Assets: the reference's ``3DMM_info.npy`` / ``keys_info.npy`` /
``topology_info.npy`` (Basel Face Model derived — license-restricted,
user-supplied).  ``synthetic_assets`` builds a tiny random model with the
same schema for tests.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from speech2lip_tpu.ops.geometry import euler2rot as _euler2rot_obs


class BFMAssets(NamedTuple):
    base_id: jnp.ndarray    # [id_dim, 3V]
    base_exp: jnp.ndarray   # [exp_dim, 3V]
    mu: jnp.ndarray         # [3V] (mean-centered per axis, /1e5)
    base_tex: jnp.ndarray   # [tex_dim, 3V]
    mu_tex: jnp.ndarray     # [3V]
    sig_id: jnp.ndarray     # [id_dim]
    sig_exp: jnp.ndarray    # [exp_dim]
    sig_tex: jnp.ndarray    # [tex_dim]
    keyinds: jnp.ndarray        # [68] landmark vertex ids
    left_contour: jnp.ndarray   # [8, C] candidate contour vertex ids
    right_contour: jnp.ndarray  # [8, C]
    tris: jnp.ndarray           # [F, 3]
    vert_tris: jnp.ndarray      # [V, T] triangle ids adjacent to each vertex
    point_num: int


def load_assets(modelpath: str, id_dim: int = 100, exp_dim: int = 79,
                tex_dim: int = 100) -> BFMAssets:
    """Load the reference asset files (facemodel.py:15-49)."""
    import os
    info = np.load(os.path.join(modelpath, "3DMM_info.npy"),
                   allow_pickle=True).item()
    mu = (info["mu_shape"] + info["mu_exp"]).reshape(-1, 3)
    mu = mu - mu.mean(axis=0, keepdims=True)
    keys = np.load(os.path.join(modelpath, "keys_info.npy"),
                   allow_pickle=True).item()
    topo = np.load(os.path.join(modelpath, "topology_info.npy"),
                   allow_pickle=True).item()
    point_num = mu.shape[0]
    return BFMAssets(
        base_id=jnp.asarray(info["b_shape"][:id_dim] / 1e5, jnp.float32),
        base_exp=jnp.asarray(info["b_exp"][:exp_dim] / 1e5, jnp.float32),
        mu=jnp.asarray(mu.reshape(-1) / 1e5, jnp.float32),
        base_tex=jnp.asarray(info["b_tex"][:tex_dim], jnp.float32),
        mu_tex=jnp.asarray(info["mu_tex"], jnp.float32),
        sig_id=jnp.asarray(info["sig_shape"][:id_dim], jnp.float32),
        sig_exp=jnp.asarray(info["sig_exp"][:exp_dim], jnp.float32),
        sig_tex=jnp.asarray(info["sig_tex"][:tex_dim], jnp.float32),
        keyinds=jnp.asarray(keys["keyinds"], jnp.int32),
        left_contour=jnp.asarray(keys["left_contour"], jnp.int32),
        right_contour=jnp.asarray(keys["right_contour"], jnp.int32),
        tris=jnp.asarray(topo["tris"], jnp.int32),
        vert_tris=jnp.asarray(topo["vert_tris"], jnp.int32),
        point_num=point_num,
    )


def synthetic_assets(n_verts: int = 400, id_dim: int = 10, exp_dim: int = 7,
                     tex_dim: int = 10, seed: int = 0) -> BFMAssets:
    """Tiny random BFM-schema assets for tests: a unit-sphere-ish blob."""
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((n_verts, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    from scipy.spatial import ConvexHull
    hull = ConvexHull(pts)
    tris = hull.simplices.astype(np.int32)
    # vert_tris: pad per-vertex adjacency to fixed width
    adj = [[] for _ in range(n_verts)]
    for t, (a, b, c) in enumerate(tris):
        adj[a].append(t); adj[b].append(t); adj[c].append(t)
    width = max(1, max(len(a) for a in adj))
    vert_tris = np.zeros((n_verts, width), np.int32)
    for i, a in enumerate(adj):
        a = a or [0]
        vert_tris[i] = (a * width)[:width]
    n3 = n_verts * 3
    return BFMAssets(
        base_id=jnp.asarray(rng.standard_normal((id_dim, n3)) * 0.01, jnp.float32),
        base_exp=jnp.asarray(rng.standard_normal((exp_dim, n3)) * 0.01, jnp.float32),
        mu=jnp.asarray(pts.reshape(-1), jnp.float32),
        base_tex=jnp.asarray(rng.standard_normal((tex_dim, n3)) * 5, jnp.float32),
        mu_tex=jnp.asarray(np.full(n3, 128.0), jnp.float32),
        sig_id=jnp.ones(id_dim), sig_exp=jnp.ones(exp_dim),
        sig_tex=jnp.ones(tex_dim),
        keyinds=jnp.asarray(rng.choice(n_verts, 68, replace=False), jnp.int32),
        left_contour=jnp.asarray(
            rng.choice(n_verts, (8, 5), replace=True), jnp.int32),
        right_contour=jnp.asarray(
            rng.choice(n_verts, (8, 5), replace=True), jnp.int32),
        tris=jnp.asarray(tris), vert_tris=jnp.asarray(vert_tris),
        point_num=n_verts,
    )


# ---------------------------------------------------------------------------
# Linear blend + projection (facemodel.py:102-121, util.py:48-88)
# ---------------------------------------------------------------------------

def forward_geo(assets: BFMAssets, id_para, exp_para):
    """[B, id] × [B, exp] -> [B, V, 3] geometry."""
    geo = ((id_para * assets.sig_id) @ assets.base_id
           + (exp_para * assets.sig_exp) @ assets.base_exp + assets.mu)
    return geo.reshape(id_para.shape[0], assets.point_num, 3)


def forward_tex(assets: BFMAssets, tex_para):
    tex = (tex_para * assets.sig_tex) @ assets.base_tex + assets.mu_tex
    return tex.reshape(tex_para.shape[0], assets.point_num, 3)


def euler2rot(euler):
    """Tracker euler→rot (face_tracking/util.py:18-46) — same convention as
    the training-side ops.geometry.euler2rot."""
    return _euler2rot_obs(euler)


def rot_trans_pts(geometry, rot, trans):
    """[B,V,3], [B,3,3], [B,3] -> camera-space points (util.py:48-50)."""
    return jnp.einsum("bij,bvj->bvi", rot, geometry) + trans[:, None, :]


def proj_pts(rott_geo, focal: float, cxy):
    """Pinhole with negated x (util.py:65-74): (−f·X/Z + cx, f·Y/Z + cy, Z)."""
    x, y, z = rott_geo[..., 0], rott_geo[..., 1], rott_geo[..., 2]
    px = -focal * x / z + cxy[0]
    py = focal * y / z + cxy[1]
    return jnp.stack([px, py, z], axis=-1)


def forward_transform(geometry, euler, trans, focal: float, cxy):
    rot = euler2rot(euler)
    return proj_pts(rot_trans_pts(geometry, rot, trans), focal, cxy)


def get_3dlandmarks(assets: BFMAssets, id_para, exp_para, euler, trans,
                    focal: float, cxy):
    """68 3-D landmarks with pose-dependent jaw-contour re-selection
    (facemodel.py:50-99): contour points 0-7 / 9-16 pick, per pose, the
    candidate vertex with extremal projected x."""
    b = id_para.shape[0]
    lands = forward_geo_sub(assets, id_para, exp_para, assets.keyinds)

    def contour(cands, take_min):
        ids = cands.reshape(-1)
        geo = forward_geo_sub(assets, id_para, exp_para, ids)  # [B, 8*C, 3]
        proj_x = forward_transform(geo, euler, trans, focal, cxy)[..., 0]
        proj_x = proj_x.reshape(b, 8, -1)
        pick = (jnp.argmin(proj_x, axis=2) if take_min
                else jnp.argmax(proj_x, axis=2))     # [B, 8]
        geo = geo.reshape(b, 8, -1, 3)
        return jnp.take_along_axis(
            geo, pick[:, :, None, None], axis=2)[:, :, 0, :]

    left = contour(assets.left_contour, take_min=True)
    right = contour(assets.right_contour, take_min=False)
    lands = lands.at[:, :8, :].set(left)
    lands = lands.at[:, 9:17, :].set(right)
    return lands


def forward_geo_sub(assets: BFMAssets, id_para, exp_para, vert_ids):
    """Geometry restricted to a vertex subset (facemodel.py:102-110)."""
    sel = (3 * vert_ids[:, None] + jnp.arange(3)[None, :]).reshape(-1)
    geo = ((id_para * assets.sig_id) @ assets.base_id[:, sel]
           + (exp_para * assets.sig_exp) @ assets.base_exp[:, sel]
           + assets.mu[sel])
    return geo.reshape(id_para.shape[0], vert_ids.shape[0], 3)


# ---------------------------------------------------------------------------
# Normals + SH illumination (render_3dmm.py:98-106, 187-225)
# ---------------------------------------------------------------------------

def vertex_normals(geometry, tris, vert_tris):
    """[B,V,3] → per-vertex normals by summing adjacent face normals."""
    v0 = geometry[:, tris[:, 0]]
    v1 = geometry[:, tris[:, 1]]
    v2 = geometry[:, tris[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)
    fn = fn / jnp.maximum(jnp.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
    vn = fn[:, vert_tris, :].sum(axis=2)
    return vn / jnp.maximum(jnp.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)


def sh_illumination(texture, normals, gamma):
    """9-term SH lighting (render_3dmm.py:187-225).

    texture: [B,V,3]; normals: [B,V,3]; gamma: [B,27].
    """
    b, v, _ = texture.shape
    g = gamma.reshape(b, 3, 9)
    g = g.at[:, :, 0].add(0.8)
    g = jnp.transpose(g, (0, 2, 1))  # [B, 9, 3]

    a0 = np.pi
    a1 = 2 * np.pi / np.sqrt(3.0)
    a2 = 2 * np.pi / np.sqrt(8.0)
    c0 = 1 / np.sqrt(4 * np.pi)
    c1 = np.sqrt(3.0) / np.sqrt(4 * np.pi)
    c2 = 3 * np.sqrt(5.0) / np.sqrt(12 * np.pi)
    d0 = 0.5 / np.sqrt(3.0)

    nx, ny, nz = normals[..., 0], normals[..., 1], normals[..., 2]
    h = jnp.stack([
        jnp.full_like(nx, a0 * c0),
        -a1 * c1 * ny,
        a1 * c1 * nz,
        -a1 * c1 * nx,
        a2 * c2 * nx * ny,
        -a2 * c2 * ny * nz,
        a2 * c2 * d0 * (3 * nz ** 2 - 1),
        -a2 * c2 * nx * nz,
        a2 * c2 * 0.5 * (nx ** 2 - ny ** 2),
    ], axis=-1)  # [B, V, 9]
    lighting = jnp.einsum("bvn,bnc->bvc", h, g)
    return texture * lighting


def render_mesh(assets: BFMAssets, rott_geometry, texture, gamma,
                focal: float, height: int, width: int,
                **raster_kwargs):
    """SH-lit hard render of the posed mesh (Render_3DMM.forward,
    render_3dmm.py:227-238): returns [B, H, W, 3] in [0, 255] and the
    fragments (for depth/mask reuse).

    Camera convention: the BFM camera looks down −z (reference tracker
    init trans z < 0, face_tracker.py:190-196), so rasterization depth is
    −z — same negation the tracker (`tracker.py` pix_colors) and
    `steps.mesh_depth` apply.  Before round 4 this negation was missing
    here, so every negative-z caller silently rendered black frames.

    Differentiable w.r.t. texture/gamma (shading) and geometry through the
    interpolated attribute values at fixed rasterized correspondences.
    """
    from speech2lip_tpu.ops.rasterize import interpolate_attributes, rasterize
    normals = vertex_normals(rott_geometry, assets.tris, assets.vert_tris)
    colors = sh_illumination(texture, normals, gamma)
    cxy = (width / 2.0, height / 2.0)
    pix = proj_pts(rott_geometry, focal, cxy)
    pix = pix.at[:, :, 2].multiply(-1.0)  # BFM camera looks down -z

    def one(pix_b, col_b):
        frag = rasterize(pix_b, assets.tris, height, width, **raster_kwargs)
        img = interpolate_attributes(frag, assets.tris, col_b)
        return jnp.clip(img, 0.0, 255.0), frag

    imgs, frags = jax.vmap(one)(pix, colors)
    return imgs, frags
