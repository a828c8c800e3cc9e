"""Static-scene serving renderer: windowed U-Net == full-frame U-Net.

The new-audio serving regime holds every face artifact constant per
identity (reference someones_lip_dataset.py:299-314), so
infer/static_scene.py runs the U-Net on a haloed crop and pastes into a
precomputed static frame.  These tests pin the load-bearing claims:

  - translation equivariance: the %4-aligned crop path reproduces the
    full-frame output EXACTLY (fp32) everywhere — interior via the haloed
    crop, exterior via the precomputed static face;
  - crop_geometry alignment/fallback behavior.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech2lip_tpu.data.synthetic import synthetic_batch


def test_crop_geometry_alignment():
    from speech2lip_tpu.infer.static_scene import crop_geometry, HALO

    g = crop_geometry((300, 160, 120, 180), 500, 500)
    assert g is not None
    for k in ("cy0", "cx0", "ch", "cw", "iy0", "ix0", "ih", "iw"):
        assert g[k] % 4 == 0, (k, g[k])
    assert g["iy0"] <= 300 and g["iy0"] + g["ih"] >= 300 + 120
    assert g["cy0"] == g["iy0"] - HALO
    # window hugging the frame bottom (the real May mouth): clamps to the
    # edge (exact — crop zero-padding coincides with the frame's there)
    g2 = crop_geometry((390, 160, 90, 180), 500, 500)
    assert g2 is not None
    assert g2["iy0"] + g2["ih"] == 500 and g2["cy0"] + g2["ch"] == 500
    # near-full-frame crop -> no savings -> fallback
    assert crop_geometry((2, 2, 30, 30), 100, 100) is None
    # non-%4 frame cannot keep pooling-grid alignment -> fallback
    assert crop_geometry((100, 100, 50, 50), 499, 500) is None


@pytest.mark.parametrize("clamp", [False, True])  # True: window extended
# to the frame bottom, so the crop clamps at the edge (the May regime)
def test_static_scene_matches_full_frame(rng, clamp):
    from speech2lip_tpu.core.config import default_config
    from speech2lip_tpu.data.windows import compute_warp_window
    from speech2lip_tpu.infer.static_scene import StaticSceneRenderer
    from speech2lip_tpu.models import talking_face as tf
    from speech2lip_tpu.models import unet_light

    face, lip_h, lip_w = 288, 24, 40
    cfg = default_config()
    cfg["data"]["height"], cfg["data"]["width"] = lip_h, lip_w
    cfg["model"]["canonical_depth_height"] = face
    cfg["model"]["canonical_depth_width"] = face

    raw, geo = synthetic_batch(1, face=face, lip_h=lip_h, lip_w=lip_w)
    base = {k: np.asarray(v[0]) for k, v in raw.items()}
    box = tf.expanded_lip_box(lip_h, lip_w, geo["lip_x"], geo["lip_y"])
    window = compute_warp_window([raw["coord"][0]], box, face, face,
                                 margin=4)
    assert window is not None
    if clamp:
        # a superset window is always valid; extending to the frame bottom
        # forces the crop/interior to clamp at the image edge
        wy0, wx0, wh, ww = window
        window = (wy0, wx0, face - wy0, ww)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = tf.init(k1, cfg)
    unet_p, unet_s = unet_light.init(k2)

    r = StaticSceneRenderer(cfg, params, unet_p, unet_s, base,
                            tuple(window), geo["lip_x"], geo["lip_y"],
                            use_pallas=False)
    assert r.geo is not None, "crop path must be active at this geometry"
    assert r.geo["ch"] < face  # actually smaller than the full frame

    audio = rng.standard_normal((3, 16, 29)).astype(np.float32)
    t = np.array([0.0, 3.0, 7.0], np.float32)
    fast = np.asarray(r(audio, t))
    full = np.asarray(r.render_full(audio, t))
    np.testing.assert_allclose(fast, full, rtol=1e-5, atol=1e-5)

    # audio actually drives the output (frames differ inside the window)
    assert not np.allclose(fast[0], fast[1])
    # and the static exterior is shared across frames
    g = r.geo
    ext = fast[:, : g["iy0"], :, :]
    np.testing.assert_allclose(ext[0], ext[1], atol=1e-6)


def test_exact2x_upsample_translation_equivariance(rng):
    from speech2lip_tpu.models.unet_light import _up2x

    x = jnp.asarray(rng.standard_normal((1, 32, 40, 4)).astype(np.float32))
    full = _up2x(x, 64, 80)
    # a %2-aligned input crop upsamples to the matching output crop
    crop = _up2x(x[:, 4:28, 6:34, :], 48, 56)
    np.testing.assert_allclose(np.asarray(full[:, 8:52, 12:64, :]),
                               np.asarray(crop[:, :44, :52, :]),
                               atol=1e-6)
