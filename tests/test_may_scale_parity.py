"""May-geometry whole-graph parity vs the ACTUAL reference torch code.

The round-2 parity suite (test_reference_parity.py) pins activations at toy
geometry (8×12 lip, 64² face).  This file runs the production regime —
**500² face, 120×80 lip, 9600 rays, the real expanded-box padding, the
windowed composite fast path, the blackaug branch** — through both stacks
(VERDICT r2 missing #2):

  - eval render: reference inference flow (rgb_forward 9600 rays +
    post_fusion2_onlylip) vs our ``render_face_batch`` running the windowed
    fast path;
  - whole loss pipeline: reference ``Trainer.train_stage1`` (training.py:347-574,
    perceptual ON via the lpips oracle, blackaug ON, sync ON at it>100k)
    vs our ``compute_losses`` — per-term agreement with every noise source
    pinned to the same values on both sides.

Slow: one full 500² forward+backward through CPU torch plus our eager JAX
graph.  Randomness pinning: torch.rand / random.random / torch.randn on the
reference side, jax.random.uniform / jax.random.normal on ours.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not os.path.isdir(REF),
                                 reason="reference tree unavailable")]

# the production May geometry (reference may.yaml:7-8,27-28: lip 120×80,
# face 500², focal 1200, batch_rays 9600 = H·W)
LIP_H, LIP_W = 80, 120
FACE = 500
LIP_X, LIP_Y = 190, 310   # a realistic mouth box (identity-specific at
                          # runtime; both sides get the same values)
FOCAL = 1200.0
BBOX = (150, 140, 420, 430)   # canonical_face_bbox (x, y, x2, y2)
EPS_VAL = 0.41                # pinned ensemble eps draw


@pytest.fixture(scope="module")
def may(tmp_path_factory):
    """Reference TalkingFace/Trainer at FULL May geometry + converted
    pytrees (reuses the toy-suite loaders)."""
    from test_reference_parity import _load_ref_cfg, _stub_heavy_modules

    tmp_path = tmp_path_factory.mktemp("mayparity")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _stub_heavy_modules()

    import yaml  # noqa: F401  (the loader uses it)
    cfg = _load_ref_cfg(tmp_path)
    # undo the toy shrink: restore the production values
    cfg["data"]["width"] = LIP_W
    cfg["data"]["height"] = LIP_H
    cfg["data"]["face_img_focal"] = FOCAL
    cfg["model"]["canonical_depth_height"] = FACE
    cfg["model"]["canonical_depth_width"] = FACE
    cfg["training"]["batch_rays"] = LIP_H * LIP_W

    from src.face_simple.models.tf_nerf import TalkingFace
    from src.face_simple import training as ref_training
    from src.face_simple.models.syncnet import SyncNet_color

    torch.manual_seed(0)
    model = TalkingFace(device="cpu", cfg=cfg, mode="train")
    model.eval()
    torch.manual_seed(1)
    sync_ref = SyncNet_color()
    sync_ref.eval()
    orig_load = ref_training.Trainer.load_checkpoint_syncnet
    ref_training.Trainer.load_checkpoint_syncnet = (
        lambda self, path, m: m.load_state_dict(sync_ref.state_dict()) or m)
    try:
        trainer = ref_training.Trainer(
            model, torch.optim.Adam(model.parameters(), lr=0.0),  # lr=0:
            # train_stage1 steps internally; zero LR keeps params frozen
            device="cpu", out_dir=str(tmp_path), cfg=cfg,
            batch_rays=LIP_H * LIP_W,
            use_audio_net=True, use_audio=True, use_time=True,
            use_post_fusion=True, w_post_fusion=1.0,
            use_perceptual_loss=True,
            w_perceptual_loss=cfg["training"]["w_perceptual_loss"],
            use_syncloss=True, w_syncloss=cfg["training"]["w_syncloss"],
            use_fusion_face=True, fusion_lip_only=True)
    finally:
        ref_training.Trainer.load_checkpoint_syncnet = orig_load

    from tools.convert_weights import (convert_lpips, convert_syncnet,
                                       convert_talking_face)
    tf_p, unet_p, unet_s = convert_talking_face(model.state_dict())
    sync_p, sync_s = convert_syncnet(sync_ref.state_dict())
    lp_sd = trainer.perceptual_loss_fn.state_dict()
    j = lambda t: jax.tree.map(jnp.asarray, t)
    return dict(model=model, trainer=trainer, cfg=cfg,
                tf_p=j(tf_p), unet_p=j(unet_p), unet_s=j(unet_s),
                sync_p=j(sync_p), sync_s=j(sync_s),
                lpips_p=j(convert_lpips(lp_sd, lp_sd)))


def _may_inputs(rng, n_coords: int = 6):
    """Self-consistent 500² inputs: near-identity coord grids (smooth
    per-frame shifts ≤ ~6px) so a warp window exists, plus face/lip/mask
    tensors at the real expanded-box geometry."""
    ys, xs = np.meshgrid(np.linspace(-1, 1, FACE), np.linspace(-1, 1, FACE),
                         indexing="ij")
    ident = np.stack([xs, ys], -1).astype(np.float32)
    coords = []
    for k in range(n_coords):
        s = 0.02 * np.array([np.sin(1.7 * k + 0.3), np.cos(2.3 * k)],
                            np.float32)
        coords.append(ident + s[None, None, :])
    mask = np.zeros((1, FACE, FACE, 3), np.float32)
    mask[:, LIP_Y:LIP_Y + LIP_H, LIP_X:LIP_X + LIP_W, :] = (
        rng.uniform(0, 1, (1, LIP_H, LIP_W, 3)) > 0.3)
    face_zero = rng.uniform(0.05, 1, (1, FACE, FACE, 3)).astype(np.float32)
    face_ori = rng.uniform(0.05, 1, (1, FACE, FACE, 3)).astype(np.float32)
    rgb_lip_gt = rng.uniform(0, 1, (1, LIP_H, LIP_W, 3)).astype(np.float32)
    return ident, coords, mask, face_zero, face_ori, rgb_lip_gt


def _window(coords):
    from speech2lip_tpu.data.windows import compute_warp_window
    from speech2lip_tpu.models.talking_face import expanded_lip_box
    box = expanded_lip_box(LIP_H, LIP_W, LIP_X, LIP_Y, 5)
    return compute_warp_window(coords, box, FACE, FACE, margin=8)


def test_may_eval_render_parity(may, rng):
    """The serving path at production geometry: audio encoder + 9600-ray
    MLP + windowed composite + U-Net (our render_face_batch) vs the
    reference inference flow (inference.py:144-170)."""
    from speech2lip_tpu.infer.renderer import render_face_batch

    _, coords, mask, face_zero, face_ori, _ = _may_inputs(rng)
    coord = coords[1][None]
    audio = rng.standard_normal((1, 16, 29)).astype(np.float32)
    t_index = 11.0
    model = may["model"]

    with torch.no_grad():
        from src.face_simple.rendering import get_coords as ref_get_coords
        code = model.audio_merge_forward(torch.from_numpy(audio))
        n = LIP_H * LIP_W
        uv = ref_get_coords(LIP_W, LIP_H, "cpu")
        audio_tiled = code.unsqueeze(1).tile(1, n, 1).view(-1, 64)
        rays = torch.cat([uv, audio_tiled], -1)
        lip_ref = model.rgb_forward(rays, time_pts=torch.tensor([t_index]))
        lip_ref_img = lip_ref.view(1, LIP_H, LIP_W, 3)
        recon, _, _ = model.post_fusion2_onlylip(
            lip_ref_img, torch.from_numpy(face_zero),
            torch.from_numpy(face_ori), torch.from_numpy(mask),
            LIP_X, LIP_Y, torch.from_numpy(coord),
            use_post_fusion_blackaug=False)

    window = _window([coord[0]])
    assert window is not None
    batch = {
        "audio": jnp.asarray(audio),
        "index": jnp.asarray([t_index]),
        "rgb_face_zero": jnp.asarray(face_zero),
        "rgb_face_ori": jnp.asarray(face_ori),
        "mask_lip_canonical": jnp.asarray(mask),
        "coord": jnp.asarray(coord),
    }
    out = render_face_batch(may["tf_p"], may["unet_p"], may["unet_s"], batch,
                            lip_x=LIP_X, lip_y=LIP_Y,
                            lip_h=LIP_H, lip_w=LIP_W, window=tuple(window))
    np.testing.assert_allclose(np.asarray(out["lip"]),
                               lip_ref_img.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["face"]), recon.numpy(),
                               rtol=1e-3, atol=2e-4)


@pytest.mark.parametrize("blackaug_applied", [False, True])
def test_may_whole_loss_pipeline_parity(may, rng, monkeypatch,
                                        blackaug_applied):
    """train_stage1 at production geometry (9600 rays, 4-offset ensemble,
    windowed composite, blackaug branch taken or skipped, perceptual ON,
    sync ON) vs compute_losses: per-term agreement."""
    import random as pyrandom
    from speech2lip_tpu.train.train_step import StepStatics, compute_losses

    apply_draw = 0.9 if blackaug_applied else 0.1

    ident, coords, mask, face_zero, face_ori, rgb_lip_gt = _may_inputs(rng)
    coord = coords[2][None]
    coord_window = np.stack([coords[i % len(coords)] for i in range(5)])[None]
    audio = rng.standard_normal((1, 16, 29)).astype(np.float32)
    audio_window = rng.standard_normal((1, 5, 16, 29)).astype(np.float32)
    mel = rng.standard_normal((1, 1, 80, 16)).astype(np.float32)
    neg = rng.uniform(0, 1, (1, 3, 5, 96, 96)).astype(np.float32)
    euler = (0.05 * rng.standard_normal((1, 3))).astype(np.float32)
    trans = np.array([[0.01, -0.02, 2.05]], np.float32)
    can_euler = np.zeros((1, 3), np.float32)
    can_trans = np.array([[0.0, 0.0, 2.0]], np.float32)
    head_mask = np.zeros((1, FACE, FACE, 1), np.float32)
    head_mask[:, 4:-4, 4:-4] = 1.0
    face_mask3 = np.zeros((1, FACE, FACE, 3), np.float32)
    face_mask3[:, 8:-8, 8:-8] = 1.0
    t_index = 9.0
    total_frames = 40.0

    # ---- pin every noise source
    noise_raw = [rng.standard_normal((1, 3, FACE, FACE)).astype(np.float32)
                 for _ in range(2)]
    real_rand = torch.rand

    def fixed_rand(*shape, **kw):
        if shape == (1,):
            return torch.full((1,), EPS_VAL)
        return real_rand(*shape, **kw)

    ref_noise_queue = [torch.from_numpy(n) for n in noise_raw]
    real_randn = torch.randn

    def fixed_randn(*shape, **kw):
        if tuple(shape) == (1, 3, FACE, FACE) or (
                len(shape) == 1 and tuple(shape[0]) == (1, 3, FACE, FACE)):
            return ref_noise_queue.pop(0)
        return real_randn(*shape, **kw)

    monkeypatch.setattr(torch, "rand", fixed_rand)
    monkeypatch.setattr(torch, "randn", fixed_randn)
    monkeypatch.setattr(pyrandom, "random", lambda: apply_draw)

    real_uniform = jax.random.uniform

    def fixed_uniform(key, shape=(), *a, **kw):
        if shape == ():
            return jnp.float32(apply_draw)   # blackaug apply draw
        if tuple(shape) in ((1,), (5,)):
            # ensemble eps draw: (1,) in the stage-1 render, (B*T,) = (5,)
            # in the batched sync-window render
            return jnp.full(shape, EPS_VAL)
        return real_uniform(key, shape, *a, **kw)

    our_noise_queue = [jnp.asarray(n[:, 0, :, :, None]) for n in noise_raw]
    real_normal = jax.random.normal

    def fixed_normal(key, shape=(), *a, **kw):
        if tuple(shape) == (1, FACE, FACE, 1):
            return our_noise_queue.pop(0)
        return real_normal(key, shape, *a, **kw)

    monkeypatch.setattr(jax.random, "uniform", fixed_uniform)
    monkeypatch.setattr(jax.random, "normal", fixed_normal)

    # ---- reference: one full train_stage1 step (lr=0 optimizer)
    data = {
        "audio": torch.from_numpy(audio),
        "rgb": torch.from_numpy(rgb_lip_gt),
        "rgb_zero": torch.from_numpy(rgb_lip_gt),  # unused (use_rgb off)
        "coord": torch.from_numpy(coord),
        "rgb_face_zero": torch.from_numpy(face_zero),
        "rgb_face_ori": torch.from_numpy(face_ori),
        "mask_lip_canonical": torch.from_numpy(mask),
        "lip_lefttop_x": LIP_X, "lip_lefttop_y": LIP_Y,
        "index": torch.tensor([t_index]),
        "total_frame": torch.tensor([total_frames]),
        "euler": torch.from_numpy(euler),
        "trans": torch.from_numpy(trans),
        "canonical_euler": torch.from_numpy(can_euler),
        "canonical_trans": torch.from_numpy(can_trans),
        "mask_head_3DMM_canonical": torch.from_numpy(head_mask),
        "mask_face_3DMM_canonical": torch.from_numpy(face_mask3),
        "mel": torch.from_numpy(mel),
        "audio_window": torch.from_numpy(audio_window),
        "coord_window": torch.from_numpy(coord_window),
        "rgb_window_neg": torch.from_numpy(neg),
        "canonical_face_bbox": torch.tensor(
            [[BBOX[0], BBOX[1], BBOX[2], BBOX[3], 1.0]]),
    }
    _, ref_loss = may["trainer"].train_stage1(data, it=150_001)

    # ---- ours: compute_losses with the SAME pinned draws
    window = _window([c for c in coord_window[0]] + [coord[0]])
    assert window is not None
    st = StepStatics(
        lip_h=LIP_H, lip_w=LIP_W, lip_x=LIP_X, lip_y=LIP_Y,
        face_h=FACE, face_w=FACE, focal=FOCAL,
        w_perceptual=float(may["cfg"]["training"]["w_perceptual_loss"]),
        w_sync=float(may["cfg"]["training"]["w_syncloss"]),
        use_blackaug=True, sync_on=True, face_bbox=BBOX,
        # it=150001 > 100k: the reference has frozen the postnet and put it
        # in eval (running-stats BN, reference train.py:188-197); the
        # fixture's model.eval() mirrors that, and postnet_frozen selects
        # the same eval-BN on our side
        postnet_frozen=True,
        ensemble=True, window=tuple(window))
    batch = {k: jnp.asarray(v) for k, v in {
        "audio": audio, "index": np.array([t_index], np.float32),
        "total_frame": np.array([total_frames], np.float32),
        "rgb": rgb_lip_gt, "rgb_face_zero": face_zero,
        "rgb_face_ori": face_ori, "mask_lip_canonical": mask,
        "coord": coord, "euler": euler, "trans": trans,
        "canonical_euler": can_euler, "canonical_trans": can_trans,
        "mask_head_canonical": head_mask, "mask_face_canonical": face_mask3,
        "mel": mel, "audio_window": audio_window,
        "coord_window": coord_window, "rgb_window_neg": neg,
    }.items()}
    frozen = {"lpips": may["lpips_p"],
              "syncnet": (may["sync_p"], may["sync_s"])}
    _, (m, _) = compute_losses(may["tf_p"], may["unet_p"], may["unet_s"],
                               frozen, batch, jax.random.PRNGKey(0), st)

    def close(ours, theirs, rtol=2e-3, atol=2e-5):
        np.testing.assert_allclose(float(ours), float(theirs),
                                   rtol=rtol, atol=atol)

    close(m["loss_rgb"], ref_loss["loss_rgb"])
    close(m["loss_perceptual_lip"] + m["loss_perceptual_face"],
          ref_loss["loss_perceptual"])
    close(m["loss_canonical_depth_photo"],
          ref_loss["loss_canonical_depth_photo"])
    close(m["loss_sync"], ref_loss["loss_sync"])
    close(m["loss"], ref_loss["loss"])
