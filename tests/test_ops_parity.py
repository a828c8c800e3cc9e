"""Numeric-parity tests of core ops against torch-CPU oracles.

The reference implementation is torch; these tests pin our JAX ops to the
exact torch semantics the reference relies on (grid_sample align_corners=False,
Upsample align_corners=True, NeRF embedder layout, euler2rot conventions).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from speech2lip_tpu.ops.coords import ensemble_coords, get_coords
from speech2lip_tpu.ops.embedders import fourier_embed, fourier_embed_dim, time_embed
from speech2lip_tpu.ops.geometry import (backproject_depth, euler2rot,
                                         intrinsics, inverse_warp,
                                         pose_matrix, project_3d,
                                         rel_pose_obs2can)
from speech2lip_tpu.ops.grid_sample import grid_sample
from speech2lip_tpu.ops import nn as snn


# ---------------------------------------------------------------------------
# coords / embedders
# ---------------------------------------------------------------------------

def test_get_coords_matches_reference_layout():
    w, h = 6, 4
    c = np.asarray(get_coords(w, h))
    x = torch.linspace(0, 1, w)
    y = torch.linspace(0, 1, h)
    v, u = torch.meshgrid(y, x, indexing="ij")
    ref = torch.stack([u, v], -1).view(-1, 2).numpy()
    np.testing.assert_allclose(c, ref, atol=1e-7)


def test_fourier_embed_matches_torch_embedder(rng):
    x = rng.standard_normal((7, 2)).astype(np.float32)
    multires = 10
    out = np.asarray(fourier_embed(jnp.asarray(x), multires))
    assert out.shape[-1] == fourier_embed_dim(2, multires) == 42
    # build the reference layout by hand (tf_nerf.py:404-425)
    xt = torch.from_numpy(x)
    parts = [xt]
    freqs = 2.0 ** torch.linspace(0.0, multires - 1, steps=multires)
    for f in freqs:
        parts += [torch.sin(xt * f), torch.cos(xt * f)]
    ref = torch.cat(parts, -1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_time_embed_matches_torch():
    import math
    pos = 37.0
    out = np.asarray(time_embed(pos, 20))
    out_dims = 20
    div = torch.exp(torch.arange(0, out_dims, 2, dtype=torch.float)
                    * -(math.log(10000.0) / out_dims))
    pe = torch.zeros(out_dims)
    pe[0::2] = torch.sin(pos * div)
    pe[1::2] = torch.cos(pos * div)
    # fp32 exp() rounding differs slightly between XLA and torch
    np.testing.assert_allclose(out, pe.numpy(), rtol=1e-4, atol=1e-4)


def test_ensemble_coords_weights_match_reference(rng):
    w, h = 12, 8
    coords = np.asarray(get_coords(w, h))
    eps = 0.013
    shifted, weights = ensemble_coords(jnp.asarray(coords), w, h,
                                       jnp.float32(eps))
    # reference loop (training.py:195-249)
    ct = torch.from_numpy(coords)
    rx, ry = 0.5 / w, 0.5 / h
    preds_coords, areas = [], []
    for vx in [-1, 1]:
        for vy in [-1, 1]:
            c = ct.clone()
            c[:, 0] += vx * rx + eps
            c[:, 1] += vy * ry + eps
            c.clamp_(0, 1)
            preds_coords.append(c)
            areas.append(torch.abs((c[:, 0] - ct[:, 0]) * (c[:, 1] - ct[:, 1])) + 1e-9)
    tot = torch.stack(areas).sum(0)
    t = areas[0]; areas[0] = areas[3]; areas[3] = t
    t = areas[1]; areas[1] = areas[2]; areas[2] = t
    for k in range(4):
        np.testing.assert_allclose(np.asarray(shifted)[k],
                                   preds_coords[k].numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(weights)[k],
                                   (areas[k] / tot).numpy(), rtol=1e-4)


# ---------------------------------------------------------------------------
# grid_sample
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_matches_torch(rng, padding_mode):
    img = rng.standard_normal((2, 9, 11, 3)).astype(np.float32)
    grid = (rng.uniform(-1.3, 1.3, (2, 5, 7, 2))).astype(np.float32)
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                 padding_mode=padding_mode))
    ref = F.grid_sample(torch.from_numpy(img).permute(0, 3, 1, 2),
                        torch.from_numpy(grid), mode="bilinear",
                        padding_mode=padding_mode, align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_grid_sample_onehot_border_matches_torch(rng):
    """MXU one-hot border sampling == torch grid_sample(border) for EVERY
    grid value, including far out-of-range coordinates (the canonical-depth
    warp can land anywhere when the learned depth is bad early on)."""
    from speech2lip_tpu.ops.grid_sample import grid_sample_onehot_border
    img = rng.standard_normal((2, 9, 11, 3)).astype(np.float32)
    grid = rng.uniform(-3.0, 3.0, (2, 35, 2)).astype(np.float32)
    out = np.asarray(grid_sample_onehot_border(jnp.asarray(img),
                                               jnp.asarray(grid)))
    ref = F.grid_sample(torch.from_numpy(img).permute(0, 3, 1, 2),
                        torch.from_numpy(grid).view(2, 35, 1, 2),
                        mode="bilinear", padding_mode="border",
                        align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy().reshape(2, 35, 3)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_warp_grid_crop_matches_full_frame(rng):
    """warp_grid_crop == backproject+project grids at the crop pixels, and
    the crop fast path (warp_grid_crop + onehot border) reproduces
    inverse_warp's output on the crop."""
    from speech2lip_tpu.ops.geometry import (backproject_depth, intrinsics,
                                             inverse_warp, project_3d,
                                             warp_grid_crop)
    from speech2lip_tpu.ops.grid_sample import grid_sample_onehot_border
    h, w = 17, 19
    box = (3, 14, 2, 11)  # x0, x1, y0, y1
    depth = (rng.uniform(2.0, 4.0, (h, w))).astype(np.float32)
    src = rng.standard_normal((h, w, 3)).astype(np.float32)
    k = intrinsics(25.0, h, w)
    inv_k = np.linalg.pinv(k).astype(np.float32)
    rel = np.eye(4, dtype=np.float32)
    rel[:3, :3] = np.asarray(
        [[0.999, -0.02, 0.04], [0.02, 0.999, -0.01], [-0.04, 0.01, 0.999]],
        np.float32)
    rel[:3, 3] = [0.05, -0.03, 0.1]

    grid_full, _ = project_3d(backproject_depth(jnp.asarray(depth),
                                                jnp.asarray(inv_k)),
                              jnp.asarray(k), jnp.asarray(rel), h, w)
    grid_crop = warp_grid_crop(jnp.asarray(depth), jnp.asarray(rel),
                               jnp.asarray(k), jnp.asarray(inv_k), box, h, w)
    x0, x1, y0, y1 = box
    np.testing.assert_allclose(np.asarray(grid_crop),
                               np.asarray(grid_full)[y0:y1, x0:x1],
                               rtol=1e-5, atol=1e-6)

    warped_full, _ = inverse_warp(jnp.asarray(src), jnp.asarray(depth),
                                  jnp.asarray(rel), jnp.asarray(k),
                                  jnp.asarray(inv_k))
    warped_crop = grid_sample_onehot_border(
        jnp.asarray(src)[None], grid_crop.reshape(1, -1, 2))
    np.testing.assert_allclose(
        np.asarray(warped_crop).reshape(y1 - y0, x1 - x0, 3),
        np.asarray(warped_full)[y0:y1, x0:x1], rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------

def _torch_euler2rot(euler):
    bs = euler.shape[0]
    theta = euler[:, 0].reshape(-1, 1, 1)
    phi = euler[:, 1].reshape(-1, 1, 1)
    psi = euler[:, 2].reshape(-1, 1, 1)
    one = torch.ones(bs, 1, 1)
    zero = torch.zeros(bs, 1, 1)
    rot_x = torch.cat((
        torch.cat((one, zero, zero), 1),
        torch.cat((zero, theta.cos(), theta.sin()), 1),
        torch.cat((zero, -theta.sin(), theta.cos()), 1),
    ), 2)
    rot_y = torch.cat((
        torch.cat((phi.cos(), zero, -phi.sin()), 1),
        torch.cat((zero, one, zero), 1),
        torch.cat((phi.sin(), zero, phi.cos()), 1),
    ), 2)
    rot_z = torch.cat((
        torch.cat((psi.cos(), -psi.sin(), zero), 1),
        torch.cat((psi.sin(), psi.cos(), zero), 1),
        torch.cat((zero, zero, one), 1)
    ), 2)
    return torch.bmm(rot_x, torch.bmm(rot_y, rot_z))


def test_euler2rot_matches_torch(rng):
    e = rng.standard_normal((4, 3)).astype(np.float32)
    ours = np.asarray(euler2rot(jnp.asarray(e)))
    ref = _torch_euler2rot(torch.from_numpy(e)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_pose_matrix_sign_flips(rng):
    e = rng.standard_normal((2, 3)).astype(np.float32)
    t = rng.standard_normal((2, 3)).astype(np.float32)
    ours = np.asarray(pose_matrix(jnp.asarray(e), jnp.asarray(t)))
    # torch reference (models/utils.py:36-52)
    et = torch.from_numpy(e.copy())
    tt = torch.from_numpy(t.copy())
    et[:, 2] = -et[:, 2]; et[:, 1] = -et[:, 1]
    tt[:, 2] = -tt[:, 2]; tt[:, 1] = -tt[:, 1]
    rot = _torch_euler2rot(et)
    top = torch.cat([rot, tt.unsqueeze(-1)], -1)
    bottom = torch.tensor([0., 0., 0., 1.]).view(1, 1, 4).repeat(2, 1, 1)
    ref = torch.cat([top, bottom], 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_inverse_warp_matches_torch_pipeline(rng):
    h, w = 16, 16
    focal = 30.0
    depth = (rng.uniform(0.5, 2.0, (h, w))).astype(np.float32)
    src = rng.standard_normal((h, w, 3)).astype(np.float32)
    e_can = rng.standard_normal((1, 3)).astype(np.float32) * 0.1
    t_can = rng.standard_normal((1, 3)).astype(np.float32) * 0.1
    e = e_can + 0.05 * rng.standard_normal((1, 3)).astype(np.float32)
    t = t_can + 0.05 * rng.standard_normal((1, 3)).astype(np.float32)

    k = intrinsics(focal, h, w)
    inv_k = np.linalg.pinv(k)
    rel = rel_pose_obs2can(jnp.asarray(e_can), jnp.asarray(t_can),
                           jnp.asarray(e), jnp.asarray(t))[0]
    warped, z = inverse_warp(jnp.asarray(src), jnp.asarray(depth), rel,
                             jnp.asarray(k), jnp.asarray(inv_k))

    # torch oracle: BackprojectDepth + Project3D + grid_sample(border)
    kt = torch.from_numpy(k).unsqueeze(0)
    inv_kt = torch.from_numpy(inv_k.astype(np.float32)).unsqueeze(0)
    xs, ys = np.meshgrid(range(w), range(h), indexing="xy")
    pix = torch.from_numpy(
        np.stack([xs.reshape(-1), ys.reshape(-1), np.ones(h * w)], 0)
    ).float().unsqueeze(0)
    cam = torch.matmul(inv_kt[:, :3, :3], pix)
    cam = torch.from_numpy(depth).view(1, 1, -1) * cam
    cam = torch.cat([cam, torch.ones(1, 1, h * w)], 1)
    rel_t = torch.from_numpy(np.asarray(rel)).unsqueeze(0)
    p = torch.matmul(kt, rel_t)[:, :3, :]
    cp = torch.matmul(p, cam)
    pc = cp[:, :2, :] / (cp[:, 2, :].unsqueeze(1) + 1e-7)
    pc = pc.view(1, 2, h, w).permute(0, 2, 3, 1)
    pc[..., 0] /= w - 1
    pc[..., 1] /= h - 1
    pc = (pc - 0.5) * 2
    ref = F.grid_sample(torch.from_numpy(src).permute(2, 0, 1).unsqueeze(0),
                        pc, padding_mode="border", align_corners=False)
    ref = ref[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(np.asarray(warped), ref, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# nn layers
# ---------------------------------------------------------------------------

def test_conv2d_matches_torch(rng):
    x = rng.standard_normal((2, 10, 12, 4)).astype(np.float32)
    wt = rng.standard_normal((6, 4, 3, 3)).astype(np.float32) * 0.1  # OIHW
    b = rng.standard_normal((6,)).astype(np.float32)
    params = {"w": jnp.asarray(wt.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)}
    out = np.asarray(snn.conv2d(params, jnp.asarray(x), stride=2, padding=1))
    ref = F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                   torch.from_numpy(wt), torch.from_numpy(b),
                   stride=2, padding=1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_conv1d_matches_torch(rng):
    x = rng.standard_normal((2, 16, 29)).astype(np.float32)  # NLC
    wt = rng.standard_normal((32, 29, 3)).astype(np.float32) * 0.1  # OIL
    b = rng.standard_normal((32,)).astype(np.float32)
    params = {"w": jnp.asarray(wt.transpose(2, 1, 0)), "b": jnp.asarray(b)}
    out = np.asarray(snn.conv1d(params, jnp.asarray(x), stride=2, padding=1))
    ref = F.conv1d(torch.from_numpy(x).permute(0, 2, 1),
                   torch.from_numpy(wt), torch.from_numpy(b),
                   stride=2, padding=1).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_batchnorm_train_and_eval_match_torch(rng):
    x = rng.standard_normal((2, 5, 5, 3)).astype(np.float32)
    params, state = snn.batchnorm_init(3)
    bn = torch.nn.BatchNorm2d(3)
    bn.train()
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = bn(xt).detach().permute(0, 2, 3, 1).numpy()
    out, new_state = snn.batchnorm(params, state, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state["mean"]),
                               bn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]),
                               bn.running_var.numpy(), rtol=1e-4, atol=1e-5)
    bn.eval()
    ref_eval = bn(xt).detach().permute(0, 2, 3, 1).numpy()
    out_eval, _ = snn.batchnorm(params, new_state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out_eval), ref_eval,
                               rtol=1e-4, atol=1e-4)


def test_maxpool_matches_torch(rng):
    x = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    out = np.asarray(snn.maxpool2d(jnp.asarray(x), 2))
    ref = F.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 2)
    np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy(), atol=1e-6)


def test_upsample_bilinear_align_corners_matches_torch(rng):
    x = rng.standard_normal((1, 5, 7, 3)).astype(np.float32)
    out = np.asarray(snn.upsample_bilinear(jnp.asarray(x), 10, 14))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                        size=(10, 14), mode="bilinear", align_corners=True)
    np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-5)


def test_leaky_relu_matches_torch(rng):
    x = rng.standard_normal((10,)).astype(np.float32)
    out = np.asarray(snn.leaky_relu(jnp.asarray(x), 0.02))
    ref = F.leaky_relu(torch.from_numpy(x), 0.02).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-7)
