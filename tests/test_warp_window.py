"""Tests of the gather-free warped box mask and the static-window composite
fast path (both must be bit-equivalent to the reference full-frame math)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from speech2lip_tpu.data.windows import compute_warp_window, validate_window
from speech2lip_tpu.models import talking_face as tf
from speech2lip_tpu.ops.grid_sample import warp_box_mask


def test_warp_box_mask_matches_gathered_grid_sample(rng):
    H = W = 40
    box = (7, 29, 11, 33)  # x0, x1, y0, y1
    grid = rng.uniform(-1.2, 1.2, (2, 25, 31, 2)).astype(np.float32)

    out = np.asarray(warp_box_mask(jnp.asarray(grid), box, H, W))

    box_img = torch.zeros(2, 1, H, W)
    box_img[:, :, box[2]:box[3], box[0]:box[1]] = 1.0
    ref = F.grid_sample(box_img, torch.from_numpy(grid), mode="bilinear",
                        padding_mode="zeros", align_corners=False)
    ref = (ref != 0).float().permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(out, ref)


def test_windowed_composite_equals_full(rng):
    B, H, W, lh, lw = 2, 48, 48, 12, 16
    lip_x, lip_y = 16, 28
    rgb_lip = rng.uniform(0, 1, (B, lh, lw, 3)).astype(np.float32)
    face = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    gt = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    mask = (rng.uniform(0, 1, (B, H, W, 3)) > 0.5).astype(np.float32)
    # near-identity warp so the lip stays around its own region
    ys, xs = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    coord = np.stack([xs, ys], -1)[None].repeat(B, 0).astype(np.float32)
    coord += 0.01 * rng.standard_normal(coord.shape).astype(np.float32)

    box = tf.expanded_lip_box(lh, lw, lip_x, lip_y)
    window = compute_warp_window([coord[i] for i in range(B)], box, H, W)
    assert window is not None
    assert validate_window([coord[i] for i in range(B)], box, window, H, W)

    args = (jnp.asarray(rgb_lip), jnp.asarray(face), jnp.asarray(gt),
            jnp.asarray(mask), jnp.asarray(coord), lip_x, lip_y)
    full, _, _ = tf.post_fusion_composite(*args)
    fast, _, _ = tf.post_fusion_composite(*args, window=window)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(full),
                               rtol=1e-5, atol=1e-6)


def test_windowed_blackaug_composite_matches_full(rng):
    """The gradient-windowed blackaug path is forward-exact vs the full path
    and its gradient w.r.t. the lip matches."""
    import jax
    B, H, W, lh, lw = 1, 48, 48, 12, 16
    lip_x, lip_y = 16, 28
    rgb_lip = jnp.asarray(rng.uniform(0, 1, (B, lh, lw, 3)).astype(np.float32))
    face = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(0, 1, (B, H, W, 3)) > 0.5).astype(np.float32))
    ys, xs = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    coord = np.stack([xs, ys], -1)[None].astype(np.float32)
    coord += 0.01 * rng.standard_normal(coord.shape).astype(np.float32)
    coord = jnp.asarray(coord)
    noise = ((rng.uniform(0, 1, (B, H, W, 1)) > 0.5).astype(np.float32),
             (rng.uniform(0, 1, (B, H, W, 1)) > 0.5).astype(np.float32),
             jnp.asarray(True))
    noise = (jnp.asarray(noise[0]), jnp.asarray(noise[1]), noise[2])

    box = tf.expanded_lip_box(lh, lw, lip_x, lip_y)
    window = compute_warp_window([np.asarray(coord)[0]], box, H, W)

    def out_full(lip):
        o, _, _ = tf.post_fusion_composite(lip, face, gt, mask, coord,
                                           lip_x, lip_y, blackaug_noise=noise)
        return o

    def out_win(lip):
        o, _, _ = tf.post_fusion_composite(lip, face, gt, mask, coord,
                                           lip_x, lip_y, blackaug_noise=noise,
                                           window=window)
        return o

    np.testing.assert_allclose(np.asarray(out_win(rgb_lip)),
                               np.asarray(out_full(rgb_lip)),
                               rtol=1e-5, atol=1e-6)
    g_full = jax.grad(lambda l: jnp.sum(out_full(l) ** 2))(rgb_lip)
    g_win = jax.grad(lambda l: jnp.sum(out_win(l) ** 2))(rgb_lip)
    np.testing.assert_allclose(np.asarray(g_win), np.asarray(g_full),
                               rtol=1e-4, atol=1e-5)


def test_grid_sample_onehot_matches_gather(rng):
    """One-hot-matmul sampling equals the gather sampler wherever all four
    bilinear neighbors fall inside the crop."""
    from speech2lip_tpu.ops.grid_sample import grid_sample, grid_sample_onehot
    H = W = 64
    y_off, x_off, hs, ws = 10, 14, 24, 30
    img = rng.uniform(0, 1, (2, H, W, 3)).astype(np.float32)
    src = img[:, y_off:y_off + hs, x_off:x_off + ws]
    # sample points strictly interior to the crop (1px margin)
    px = rng.uniform(x_off + 1, x_off + ws - 2, (2, 200)).astype(np.float32)
    py = rng.uniform(y_off + 1, y_off + hs - 2, (2, 200)).astype(np.float32)
    gx = (2 * px + 1) / W - 1
    gy = (2 * py + 1) / H - 1
    grid = np.stack([gx, gy], -1)

    ref = grid_sample(jnp.asarray(img),
                      jnp.asarray(grid)[:, :, None, :])[:, :, 0, :]
    out = grid_sample_onehot(jnp.asarray(src), jnp.asarray(grid),
                             y_off, x_off, H, W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_cached_warp_window(tmp_path, rng):
    from speech2lip_tpu.data.windows import cached_warp_window
    H = W = 48
    box = (16, 32, 20, 36)
    ys, xs = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    coord = np.stack([xs, ys], -1).astype(np.float32)
    calls = []

    def factory():
        calls.append(1)
        return iter([coord])

    w1 = cached_warp_window(str(tmp_path), box, H, W, factory)
    w2 = cached_warp_window(str(tmp_path), box, H, W, factory)
    assert w1 == w2 and len(calls) == 1       # second hit came from disk
    # key change invalidates
    w3 = cached_warp_window(str(tmp_path), (15, 32, 20, 36), H, W, factory)
    assert len(calls) == 2


def test_window_sample_kernel_matches_onehot_interpret():
    """The fused Pallas window sampler equals the XLA one-hot sampler
    (interpret mode on CPU; compiled equivalence runs in test_tpu_hw.py)."""
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from speech2lip_tpu.ops.grid_sample import grid_sample_onehot
    from speech2lip_tpu.ops.pallas.window_sample import window_sample

    rng = np.random.default_rng(3)
    B, Hs, Ws, P, H, W = 2, 20, 24, 64, 64, 64
    y_off, x_off = 10, 8
    src = jnp.asarray(rng.uniform(0, 1, (B, Hs, Ws, 3)).astype(np.float32))
    gx = rng.uniform((x_off + 2) / W * 2 - 1, (x_off + Ws - 3) / W * 2 - 1,
                     (B, P))
    gy = rng.uniform((y_off + 2) / H * 2 - 1, (y_off + Hs - 3) / H * 2 - 1,
                     (B, P))
    grid = jnp.asarray(np.stack([gx, gy], -1).astype(np.float32))
    ref = grid_sample_onehot(src, grid, y_off, x_off, H, W)
    with pltpu.force_tpu_interpret_mode():
        got = window_sample(src, grid, y_off, x_off, H, W, tile=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
