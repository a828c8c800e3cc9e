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
