"""TalkingFace model tests: construction, forward shapes, torch-oracle parity
of the MLP trunk + audio encoder, and Pallas-kernel equivalence (interpreted)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from speech2lip_tpu.core.config import default_config
from speech2lip_tpu.models import talking_face as tf
from speech2lip_tpu.ops.coords import ensemble_coords, get_coords
from speech2lip_tpu.ops.embedders import fourier_embed


@pytest.fixture(scope="module")
def cfg():
    c = default_config()
    c["model"]["canonical_depth_height"] = 16
    c["model"]["canonical_depth_width"] = 16
    return c


@pytest.fixture(scope="module")
def params(cfg):
    return tf.init(jax.random.PRNGKey(0), cfg)


def test_init_shapes(params):
    assert params["fc_uv"]["w"].shape == (42, 256)
    assert params["fc_audio"]["w"].shape == (64, 256)
    assert params["fc_time"]["w"].shape == (20, 256)
    assert len(params["trunk"]) == 8
    assert params["trunk"][5]["w"].shape == (512, 256)  # post-skip layer
    assert params["trunk"][4]["w"].shape == (256, 256)
    assert params["output"]["w"].shape == (256, 3)
    assert params["canonical_depth"].shape == (16, 16)


def test_encode_audio_shape_and_torch_parity(params, rng):
    audio = rng.standard_normal((2, 16, 29)).astype(np.float32)
    code = tf.encode_audio(params, jnp.asarray(audio))
    assert code.shape == (2, 64)

    # torch oracle with identical weights (conv1d over the 16-step window,
    # channels = 29 features; reference tf_nerf.py:91-109,197-213)
    convs = []
    chans = [(29, 32), (32, 32), (32, 64), (64, 64)]
    for i, (ci, co) in enumerate(chans):
        m = torch.nn.Conv1d(ci, co, 3, stride=2, padding=1)
        w = np.asarray(params["audio_enc"]["conv"][i]["w"])  # LIO
        m.weight.data = torch.from_numpy(w.transpose(2, 1, 0).copy())
        m.bias.data = torch.from_numpy(np.asarray(params["audio_enc"]["conv"][i]["b"]))
        convs.append(m)
    fcs = []
    for i, (ci, co) in enumerate([(64, 64), (64, 64)]):
        m = torch.nn.Linear(ci, co)
        m.weight.data = torch.from_numpy(
            np.asarray(params["audio_enc"]["fc"][i]["w"]).T.copy())
        m.bias.data = torch.from_numpy(np.asarray(params["audio_enc"]["fc"][i]["b"]))
        fcs.append(m)
    x = torch.from_numpy(audio).permute(0, 2, 1)  # B, 29, 16
    with torch.no_grad():
        for m in convs:
            x = torch.nn.functional.leaky_relu(m(x), 0.02)
        x = x.squeeze(-1)
        x = torch.nn.functional.leaky_relu(fcs[0](x), 0.02)
        x = fcs[1](x)
    np.testing.assert_allclose(np.asarray(code), x.numpy(), rtol=1e-4, atol=1e-4)


def _torch_trunk(params, uv_emb, base, skip, skips=(4,)):
    """Torch oracle of the MLP v2 trunk (reference tf_nerf.py:264-283)."""
    def lin(p, x):
        return x @ torch.from_numpy(np.asarray(p["w"])) + torch.from_numpy(
            np.asarray(p["b"]))
    uv_t = torch.from_numpy(np.asarray(uv_emb))
    h = lin(params["fc_uv"], uv_t) + torch.from_numpy(np.asarray(base))
    for i in range(len(params["trunk"])):
        h = torch.relu(lin(params["trunk"][i], h))
        if i in skips:
            h_skip = lin(params["fc_uv_skip"], uv_t) + torch.from_numpy(
                np.asarray(skip))
            h = torch.cat([h_skip, h], -1)
    return lin(params["output"], h).numpy()


def test_mlp_trunk_matches_torch_oracle(params, rng):
    uv = rng.uniform(0, 1, (50, 2)).astype(np.float32)
    uv_emb = np.asarray(fourier_embed(jnp.asarray(uv), 10))
    base = rng.standard_normal((1, 256)).astype(np.float32)
    skip = rng.standard_normal((1, 256)).astype(np.float32)
    ours = np.asarray(tf.mlp_trunk(params, jnp.asarray(uv_emb),
                                   jnp.asarray(base), jnp.asarray(skip)))
    ref = _torch_trunk(params, uv_emb, base, skip)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_render_pixels_ensemble_shapes(params):
    coords = get_coords(12, 8)
    shifted, weights = ensemble_coords(coords, 12, 8, jnp.float32(0.0))
    audio_code = jnp.zeros((1, 64))
    rgb = tf.render_pixels(params, shifted, audio_code, t_index=3)
    assert rgb.shape == (4, 96, 3)
    blended = jnp.sum(rgb * weights[..., None], axis=0)
    assert blended.shape == (96, 3)


def test_fused_mlp_matches_xla_path(params, rng):
    from speech2lip_tpu.ops.pallas.fused_mlp import fused_mlp
    from jax.experimental.pallas import tpu as pltpu
    uv = rng.uniform(0, 1, (300, 2)).astype(np.float32)
    uv_emb = fourier_embed(jnp.asarray(uv), 10)
    base = rng.standard_normal((256,)).astype(np.float32)
    skip = rng.standard_normal((256,)).astype(np.float32)
    ref = tf.mlp_trunk(params, uv_emb, jnp.asarray(base)[None],
                       jnp.asarray(skip)[None])
    with pltpu.force_tpu_interpret_mode():
        out = fused_mlp(params, uv_emb, jnp.asarray(base), jnp.asarray(skip),
                        tile=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_post_fusion_composite_matches_torch(params, rng):
    """End-to-end parity of the compositing path (tf_nerf.py:320-386, minus
    U-Net and blackaug) against a torch oracle."""
    import torch.nn.functional as F
    B, H, W, lh, lw = 1, 32, 32, 8, 12
    lip_x, lip_y = 9, 15
    rgb_lip = rng.uniform(0, 1, (B, lh, lw, 3)).astype(np.float32)
    face = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    gt = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    mask = (rng.uniform(0, 1, (B, H, W, 3)) > 0.5).astype(np.float32)
    coord = rng.uniform(-1, 1, (B, H, W, 2)).astype(np.float32)

    unet_in, _, merged_can = tf.post_fusion_composite(
        jnp.asarray(rgb_lip), jnp.asarray(face), jnp.asarray(gt),
        jnp.asarray(mask), jnp.asarray(coord), lip_x, lip_y)

    # torch oracle
    lip_t = torch.from_numpy(rgb_lip).permute(0, 3, 1, 2)
    left, right = lip_x, W - lip_x - lw
    up, down = lip_y, H - lip_y - lh
    padded = F.pad(lip_t, (left, right, up, down)).permute(0, 2, 3, 1)
    mask_t = torch.from_numpy(mask)
    merged_ref = mask_t * padded + (1 - mask_t) * torch.from_numpy(face)
    np.testing.assert_allclose(np.asarray(merged_can), merged_ref.numpy(),
                               atol=1e-6)

    p = lw // 5
    box = torch.zeros(B, H, W, 1)
    box[:, lip_y - p:lip_y + lh + 2 * p, lip_x - p:lip_x + lw + p, :] = 1
    coord_t = torch.from_numpy(coord)
    rgb_merged = F.grid_sample(merged_ref.permute(0, 3, 1, 2), coord_t,
                               align_corners=False)
    mask_w = F.grid_sample(box.permute(0, 3, 1, 2), coord_t,
                           align_corners=False)
    mask_w = (mask_w != 0).int().float()
    ref_unet_in = (mask_w * rgb_merged
                   + (1 - mask_w) * torch.from_numpy(gt).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(unet_in),
                               ref_unet_in.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-5)


def test_head_pose_encoder_and_projections(rng):
    from speech2lip_tpu.core.config import default_config
    cfg = default_config()
    cfg["model"].update({"use_head_pose": True, "use_head_pose_net": True,
                         "use_canonical_depth": False})
    params = tf.init(jax.random.PRNGKey(1), cfg)
    assert params["fc_pose"]["w"].shape == (63, 256)  # 3*(1+2*10)
    pose = jnp.asarray(rng.standard_normal((2, 5, 3)).astype(np.float32))
    code = tf.encode_head_pose(params, pose)
    assert code.shape == (2, 3)

    # torch oracle of the pose conv stack
    convs = []
    for i, (ci, co) in enumerate([(3, 8), (8, 8), (8, 8)]):
        m = torch.nn.Conv1d(ci, co, 3, stride=2, padding=1)
        w = np.asarray(params["pose_enc"]["conv"][i]["w"])
        m.weight.data = torch.from_numpy(w.transpose(2, 1, 0).copy())
        m.bias.data = torch.from_numpy(np.asarray(
            params["pose_enc"]["conv"][i]["b"]).copy())
        convs.append(m)
    x = torch.from_numpy(np.asarray(pose)).permute(0, 2, 1)
    with torch.no_grad():
        for m in convs:
            x = torch.nn.functional.leaky_relu(m(x), 0.02)
        x = x.squeeze(-1)
        for i in range(2):
            w = torch.from_numpy(np.asarray(params["pose_enc"]["fc"][i]["w"]).copy())
            b = torch.from_numpy(np.asarray(params["pose_enc"]["fc"][i]["b"]).copy())
            x = x @ w + b
            if i == 0:
                x = torch.nn.functional.leaky_relu(x, 0.02)
    np.testing.assert_allclose(np.asarray(code), x.numpy(), rtol=1e-4,
                               atol=1e-4)


def test_audio_embed_path_init(rng):
    from speech2lip_tpu.core.config import default_config
    cfg = default_config()
    cfg["model"].update({"audio_not_embed": False, "audio_embed": 6,
                         "use_canonical_depth": False})
    params = tf.init(jax.random.PRNGKey(2), cfg)
    # 64 * (1 + 2*6) = 832 (tf_nerf.py:243 comment)
    assert params["fc_audio"]["w"].shape == (832, 256)


def test_fused_mlp_batched_matches_xla(params, rng):
    from speech2lip_tpu.ops.pallas.fused_mlp import fused_mlp_batched
    from jax.experimental.pallas import tpu as pltpu
    uv = rng.uniform(0, 1, (300, 2)).astype(np.float32)
    uv_emb = fourier_embed(jnp.asarray(uv), 10)
    base = rng.standard_normal((3, 256)).astype(np.float32)
    skip = rng.standard_normal((3, 256)).astype(np.float32)
    ref = tf.mlp_trunk(params, uv_emb[None], jnp.asarray(base)[:, None, :],
                       jnp.asarray(skip)[:, None, :])
    with pltpu.force_tpu_interpret_mode():
        out = fused_mlp_batched(params, uv_emb, jnp.asarray(base),
                                jnp.asarray(skip), tile=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
