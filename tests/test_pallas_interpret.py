"""CPU coverage for the Pallas sampling kernels via interpret mode.

The window/hat samplers use only dots and iota (no Mosaic-specific ops),
so the Pallas interpreter runs them on the CPU backend — the pytest
suite pins their semantics (and hat_sample's custom VJP) without TPU
hardware; tests/test_tpu_hw.py re-pins the compiled kernels on a chip.
"""

import numpy as np
import pytest

import speech2lip_tpu.ops.pallas.hat_sample as hs_mod
import speech2lip_tpu.ops.pallas.window_sample as ws_mod


@pytest.fixture
def interp(monkeypatch):
    monkeypatch.setattr(ws_mod, "INTERPRET", True)
    monkeypatch.setattr(hs_mod, "INTERPRET", True)
    ws_mod.window_sample.clear_cache()
    yield
    ws_mod.window_sample.clear_cache()


def test_window_sample_interpret_matches_onehot(interp):
    import jax.numpy as jnp
    from speech2lip_tpu.ops.grid_sample import grid_sample_onehot

    rng = np.random.default_rng(0)
    B, Hs, Ws, P, H, W = 2, 22, 38, 300, 100, 120
    y_off, x_off = 40, 40
    src = jnp.asarray(rng.uniform(0, 1, (B, Hs, Ws, 3)).astype(np.float32))
    gx = rng.uniform((x_off + 2) / W * 2 - 1, (x_off + Ws - 3) / W * 2 - 1,
                     (B, P))
    gy = rng.uniform((y_off + 2) / H * 2 - 1, (y_off + Hs - 3) / H * 2 - 1,
                     (B, P))
    grid = jnp.asarray(np.stack([gx, gy], -1).astype(np.float32))
    ref = grid_sample_onehot(src, grid, y_off, x_off, H, W)
    got = ws_mod.window_sample(src, grid, y_off, x_off, H, W, tile=256)
    assert float(jnp.max(jnp.abs(ref - got))) < 1e-5


def test_hat_sample_interpret_value_and_grads(interp):
    import jax
    import jax.numpy as jnp
    from speech2lip_tpu.ops.grid_sample import grid_sample

    rng = np.random.default_rng(1)
    B, H, W, P = 2, 24, 40, 256
    src = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    gx = rng.uniform(2.5 / W * 2 - 1, (W - 3.5) / W * 2 - 1, (B, P))
    gy = rng.uniform(2.5 / H * 2 - 1, (H - 3.5) / H * 2 - 1, (B, P))
    grid = jnp.asarray(np.stack([gx, gy], -1).astype(np.float32))

    for border, pad_mode in [(False, "zeros"), (True, "border")]:
        def loss_p(s, g):
            return jnp.sum(
                jnp.sin(hs_mod.hat_sample(s, g, border=border) * 3.0))

        def loss_x(s, g):
            out = grid_sample(s, g.reshape(B, P, 1, 2),
                              padding_mode=pad_mode).reshape(B, P, 3)
            return jnp.sum(jnp.sin(out * 3.0))

        vp, (dsp, dgp) = jax.value_and_grad(loss_p, (0, 1))(src, grid)
        vx, (dsx, dgx) = jax.value_and_grad(loss_x, (0, 1))(src, grid)
        assert abs(float(vp - vx)) < 1e-4 * abs(float(vx)) + 1e-3
        assert float(jnp.max(jnp.abs(dsp - dsx))) < 1e-4, border
        assert float(jnp.max(jnp.abs(dgp - dgx))) < 5e-3, border

    # out-of-range: zeros -> exact 0; border -> clamped to the edge
    far = jnp.asarray(np.stack([gx * 0 + 1.8, gy], -1).astype(np.float32))
    assert float(jnp.max(jnp.abs(
        hs_mod.hat_sample(src, far, border=False)))) == 0.0
    refb = grid_sample(src, far.reshape(B, P, 1, 2),
                       padding_mode="border").reshape(B, P, 3)
    outb = hs_mod.hat_sample(src, far, border=True)
    assert float(jnp.max(jnp.abs(outb - refb))) < 1e-5


@pytest.mark.heavy
def test_depth_loss_points_path_matches_xla(interp):
    """The canonical-depth POINTS path (frozen['depth_pts']: sample +
    masked MSE only at the loss mask's support, train_step.compute_losses)
    must reproduce the XLA full-frame inverse_warp branch — value and
    d/d(canonical_depth) — since the mask is zero everywhere else."""
    import jax
    import jax.numpy as jnp
    from speech2lip_tpu.core.config import default_config
    from speech2lip_tpu.data.synthetic import synthetic_batch
    from speech2lip_tpu.models import lpips as lpips_mod
    from speech2lip_tpu.models import talking_face as tfm
    from speech2lip_tpu.models import unet_light
    from speech2lip_tpu.train.train_step import StepStatics, compute_losses

    face, lip_h, lip_w = 64, 16, 24
    cfg = default_config()
    cfg["model"]["canonical_depth_height"] = face
    cfg["model"]["canonical_depth_width"] = face
    raw, geo = synthetic_batch(2, face=face, lip_h=lip_h, lip_w=lip_w)
    # the points path's premise: target + masks are per-identity constants
    for k in ("rgb_face_zero", "mask_head_canonical", "mask_face_canonical"):
        raw[k] = np.broadcast_to(raw[k][:1], raw[k].shape).copy()
    batch = jax.tree.map(jnp.asarray, raw)

    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    params = tfm.init(keys[0], cfg)
    unet_p, unet_s = unet_light.init(keys[1])
    frozen = {"lpips": lpips_mod.init(keys[2])}

    m = np.asarray(raw["mask_head_canonical"][0]) * (
        1.0 - np.asarray(raw["mask_face_canonical"][0]))
    tgt = np.asarray(raw["rgb_face_zero"][0])
    m = np.broadcast_to(m, tgt.shape)
    ys, xs = np.nonzero(m.max(axis=-1) > 0)
    assert ys.size > 0
    pts = {"xs": jnp.asarray(xs, jnp.int32), "ys": jnp.asarray(ys, jnp.int32),
           "w": jnp.asarray(m[ys, xs], jnp.float32),
           "rgb_zero_pts": jnp.asarray(tgt[ys, xs], jnp.float32)}

    def depth_term(p, st, fz):
        _, (metrics, _) = compute_losses(p, unet_p, unet_s, fz, batch,
                                         jax.random.PRNGKey(3), st)
        return metrics["loss_canonical_depth_photo"]

    def statics(pg):
        return StepStatics(
            lip_h=lip_h, lip_w=lip_w, lip_x=geo["lip_x"], lip_y=geo["lip_y"],
            face_h=face, face_w=face, focal=120.0,
            face_bbox=(8, 8, 56, 56), use_perceptual=False,
            use_blackaug=False, depth_loss_box=None, pallas_gather=pg)

    vx, gx_ = jax.value_and_grad(depth_term)(params, statics(False), frozen)
    vp, gp_ = jax.value_and_grad(depth_term)(
        params, statics(True), dict(frozen, depth_pts=pts))
    assert abs(float(vp - vx)) < 1e-5 + 1e-4 * abs(float(vx)), (vp, vx)
    dx, dp = gx_["canonical_depth"], gp_["canonical_depth"]
    scale = float(jnp.max(jnp.abs(dx))) + 1e-8
    assert float(jnp.max(jnp.abs(dp - dx))) < 5e-3 * scale
