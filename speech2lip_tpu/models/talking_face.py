"""TalkingFace — the canonical-space neural lip renderer, TPU-first.

Functional JAX equivalent of the reference's ``TalkingFace`` module
(reference src/face_simple/models/tf_nerf.py:12-389) in its production
("May") configuration: strided-Conv1d audio encoder (tf_nerf.py:91-109),
NeRF positional uv embedding, transformer time embedding, the MLP-v2 trunk
with a mid-skip (tf_nerf.py:146-172,225-285), a learned 500×500 canonical
depth map (tf_nerf.py:174-195), and the post-fusion lip compositing pipeline
(tf_nerf.py:287-389).

TPU-first design choices (vs a straight port):
- The audio/time projections are **per-frame constants**: they are computed
  once per frame and broadcast over pixels, instead of being recomputed for
  every one of the H·W rays as the reference does (training.py:165,171 tiles
  the audio code to all 9600 rays and pushes it through fc_audio per ray).
- The LIIF local ensemble's 4 offsets fold into one batched matmul chain
  (leading axis), not 4 sequential forward passes (training.py:204-239).
- The MLP trunk runs through a fused Pallas kernel on TPU (ops/pallas) with
  an XLA fallback, keeping activations in VMEM across all 8 layers.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from speech2lip_tpu.ops import nn as snn
from speech2lip_tpu.ops.embedders import fourier_embed, fourier_embed_dim, time_embed
from speech2lip_tpu.ops.grid_sample import (grid_sample, grid_sample_onehot,
                                             warp_box_mask)


AUDIO_CODE_DIM = 64  # output of the audio encoder (tf_nerf.py:64-65)
TIME_DIM = 20        # 2 * time_multires=10 (tf_nerf.py:76)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init(key, cfg: Dict[str, Any], canonical_depth_init=None,
         dtype=jnp.float32):
    """Build the TalkingFace parameter pytree for the May configuration.

    Args:
      canonical_depth_init: optional [H, W] array initializing the learned
        canonical depth (reference tf_nerf.py:182-195 loads
        depth_face_canonical.npy hole-filled by the mean and head-masked).
    """
    m = cfg["model"]
    if m.get("MLP_version", "v2") != "v2":
        # The reference declares MLP_version 'v1' in its base config
        # (configs/face_simple_configs/default.yaml:37) but implements ONLY
        # v2: tf_nerf.py builds pts_linears solely under the v2 branch
        # (tf_nerf.py:146) and rgb_forward leaves `h` unbound otherwise
        # (tf_nerf.py:251) — v1 crashes at the first forward there.  Pinned
        # by tests/test_reference_parity.py::test_mlp_v1_is_dead_in_the_reference.
        raise ValueError(
            f"MLP_version={m['MLP_version']!r}: only 'v2' exists — the "
            "reference's 'v1' flag value is dead config that crashes its "
            "own forward pass")
    width = m["net_width"]
    depth = m["net_depth"]
    skips = list(m.get("skips", [4]))
    uv_dim = fourier_embed_dim(2, m["uv_embed"])  # 42

    n_keys = 10 + depth + len(skips) + 17
    keys = iter(jax.random.split(key, n_keys))

    params: Dict[str, Any] = {}

    if m["use_audio"] and m["audio_net"]:
        in_audio = 80 if m["use_audio_mel"] else 29
        params["audio_enc"] = {
            "conv": [
                snn.conv1d_init(next(keys), in_audio, 32, 3, dtype=dtype),
                snn.conv1d_init(next(keys), 32, 32, 3, dtype=dtype),
                snn.conv1d_init(next(keys), 32, 64, 3, dtype=dtype),
                snn.conv1d_init(next(keys), 64, 64, 3, dtype=dtype),
            ],
            "fc": [
                snn.linear_init(next(keys), 64, 64, dtype),
                snn.linear_init(next(keys), 64, AUDIO_CODE_DIM, dtype),
            ],
        }

    if m.get("use_head_pose") and m.get("use_head_pose_net"):
        # 3×Conv1d over the 5-step pose window + 2 FCs (tf_nerf.py:113-128)
        params["pose_enc"] = {
            "conv": [
                snn.conv1d_init(next(keys), 3, 8, 3, dtype=dtype),
                snn.conv1d_init(next(keys), 8, 8, 3, dtype=dtype),
                snn.conv1d_init(next(keys), 8, 8, 3, dtype=dtype),
            ],
            "fc": [
                snn.linear_init(next(keys), 8, 3, dtype),
                snn.linear_init(next(keys), 3, 3, dtype),
            ],
        }

    params["fc_uv"] = snn.linear_init(next(keys), uv_dim, width, dtype)
    params["fc_uv_skip"] = snn.linear_init(next(keys), uv_dim, width, dtype)
    if m["use_audio"]:
        audio_in = AUDIO_CODE_DIM
        if not m.get("audio_not_embed", True):
            audio_in = fourier_embed_dim(AUDIO_CODE_DIM, m["audio_embed"])
        params["fc_audio"] = snn.linear_init(next(keys), audio_in, width, dtype)
        params["fc_audio_skip"] = snn.linear_init(next(keys), audio_in, width, dtype)
    if m.get("use_head_pose"):
        pose_dim = fourier_embed_dim(3, m.get("head_pose_multires", 10))
        params["fc_pose"] = snn.linear_init(next(keys), pose_dim, width, dtype)
        params["fc_pose_skip"] = snn.linear_init(next(keys), pose_dim, width, dtype)
    if m["use_time"]:
        params["fc_time"] = snn.linear_init(next(keys), TIME_DIM, width, dtype)
        params["fc_time_skip"] = snn.linear_init(next(keys), TIME_DIM, width, dtype)

    layers = []
    for i in range(depth):
        # layer list mirrors tf_nerf.py:170-172: index 0 is Linear(hidden, W);
        # comprehension index i-1 in skips -> Linear(W + hidden, W)
        in_dim = width * 2 if (i - 1) in skips else width
        layers.append(snn.linear_init(next(keys), in_dim, width, dtype))
    params["trunk"] = layers
    params["output"] = snn.linear_init(next(keys), width, m["output_ch"], dtype)

    if m["use_canonical_depth"]:
        h = m["canonical_depth_height"]
        w = m["canonical_depth_width"]
        if canonical_depth_init is not None:
            params["canonical_depth"] = jnp.asarray(canonical_depth_init, dtype)
        else:
            params["canonical_depth"] = jax.random.normal(next(keys), (h, w), dtype)
    return params


def prepare_canonical_depth_init(depth_npy, head_mask) -> jnp.ndarray:
    """Hole-fill + head-mask the raw z-buffer depth (tf_nerf.py:182-192).

    depth_npy: [H, W] raw canonical depth (0 = hole);
    head_mask: [H, W] binary head mask.
    """
    d = jnp.asarray(depth_npy, jnp.float32)
    mask = (jnp.asarray(head_mask) > 0).astype(jnp.float32)
    pos = d > 0
    mean_val = jnp.sum(jnp.where(pos, d, 0.0)) / jnp.maximum(
        jnp.sum(pos.astype(jnp.float32)), 1.0)
    filled = jnp.where(pos, d, mean_val)       # fill holes with the mean
    filled = filled * mask                      # zero outside the head
    return jnp.where(pos, d, filled)            # keep original where valid


# ---------------------------------------------------------------------------
# Forward pieces
# ---------------------------------------------------------------------------

def encode_audio(params, audio: jnp.ndarray) -> jnp.ndarray:
    """DeepSpeech window -> 64-d audio code (tf_nerf.py:197-213).

    audio: [B, 16, 29] (window, features).  Conv1d runs over the 16-step
    window axis with the 29 features as channels: NLC layout directly.
    """
    x = audio  # [B, L=16, C=29]
    for conv_p in params["audio_enc"]["conv"]:
        x = snn.conv1d(conv_p, x, stride=2, padding=1)
        x = snn.leaky_relu(x, 0.02)
    x = x[:, 0, :]  # L collapsed 16->8->4->2->1
    x = snn.leaky_relu(snn.linear(params["audio_enc"]["fc"][0], x), 0.02)
    return snn.linear(params["audio_enc"]["fc"][1], x)  # [B, 64]


def encode_head_pose(params, pose_window: jnp.ndarray) -> jnp.ndarray:
    """5-step head-pose window -> 3-d pose code (tf_nerf.py:215-223).

    pose_window: [B, 5, 3] (window, euler)."""
    x = pose_window  # NLC: L=5 window steps, C=3
    for conv_p in params["pose_enc"]["conv"]:
        x = snn.conv1d(conv_p, x, stride=2, padding=1)
        x = snn.leaky_relu(x, 0.02)
    x = x[:, 0, :]
    x = snn.leaky_relu(snn.linear(params["pose_enc"]["fc"][0], x), 0.02)
    return snn.linear(params["pose_enc"]["fc"][1], x)


def frame_feature(params, audio_code: jnp.ndarray, t_index) -> tuple:
    """Per-frame constant part of the trunk input.

    Returns (base [B, W], skip [B, W]): the audio+time projections that the
    reference recomputes per ray (tf_nerf.py:252-258, 269-275) but which are
    constant across pixels of a frame.
    """
    t_emb = time_embed(t_index, TIME_DIM)[None, :].astype(audio_code.dtype)
    base = (snn.linear(params["fc_audio"], audio_code)
            + snn.linear(params["fc_time"], t_emb))
    skip = (snn.linear(params["fc_audio_skip"], audio_code)
            + snn.linear(params["fc_time_skip"], t_emb))
    return base, skip


def mlp_trunk(params, uv_emb: jnp.ndarray, base: jnp.ndarray,
              skip: jnp.ndarray, skips=(4,)) -> jnp.ndarray:
    """The 8-layer MLP-v2 trunk (tf_nerf.py:264-283), XLA path.

    uv_emb: [..., 42]; base/skip: broadcastable [..., W] per-frame features.
    Returns rgb [..., 3].
    """
    h = snn.linear(params["fc_uv"], uv_emb) + base
    h_skip_const = None
    for i, layer in enumerate(params["trunk"]):
        h = snn.relu(snn.linear(layer, h))
        if i in skips:
            if h_skip_const is None:
                h_skip_const = snn.linear(params["fc_uv_skip"], uv_emb) + skip
            h = jnp.concatenate([h_skip_const, h], axis=-1)
    return snn.linear(params["output"], h)


def render_pixels(params, coords: jnp.ndarray, audio_code: jnp.ndarray,
                  t_index, skips=(4,), use_pallas: bool = False) -> jnp.ndarray:
    """Render RGB for a set of uv coords of one frame.

    coords: [..., N, 2] in [0,1] (extra leading axes, e.g. the 4-offset
    ensemble, are folded into the batch); audio_code: [1, 64].
    """
    uv_emb = fourier_embed(coords, multires=10)
    base, skip = frame_feature(params, audio_code, t_index)
    if use_pallas:
        from speech2lip_tpu.ops.pallas.fused_mlp import fused_mlp
        shape = uv_emb.shape[:-1]
        flat = uv_emb.reshape(-1, uv_emb.shape[-1])
        out = fused_mlp(params, flat, base[0], skip[0])
        return out.reshape(*shape, out.shape[-1])
    return mlp_trunk(params, uv_emb, base, skip, skips)


# ---------------------------------------------------------------------------
# Post-fusion compositing (tf_nerf.py:287-389)
# ---------------------------------------------------------------------------

def paste_lip(rgb_lip: jnp.ndarray, face: jnp.ndarray, mask_lip: jnp.ndarray,
              lip_x: int, lip_y: int) -> jnp.ndarray:
    """Paste the lip crop into the canonical face and soft-blend by the
    canonical lip mask (tf_nerf.py:336-352).

    rgb_lip: [B, lh, lw, 3]; face/mask_lip: [B, H, W, 3]; lip_x/lip_y static.
    The May identity's ±1px pad fudge (tf_nerf.py:344-350) nets out to an
    exact paste at (lip_y, lip_x).
    """
    b, lh, lw, c = rgb_lip.shape
    h, w = face.shape[1:3]
    padded = jnp.zeros_like(face)
    padded = jax.lax.dynamic_update_slice(
        padded, rgb_lip.astype(face.dtype), (0, lip_y, lip_x, 0))
    return mask_lip * padded + (1.0 - mask_lip) * face


def expanded_lip_box_mask(h: int, w: int, lip_h: int, lip_w: int,
                          lip_x: int, lip_y: int, divisor: int = 5,
                          dtype=jnp.float32) -> jnp.ndarray:
    """Rectangular expanded lip mask (tf_nerf.py:354-364): rows
    [y-p, y+lh+2p), cols [x-p, x+lw+p) with p = lip_w // divisor."""
    p = lip_w // divisor
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    box = ((ys >= lip_y - p) & (ys < lip_y + lip_h + 2 * p)
           & (xs >= lip_x - p) & (xs < lip_x + lip_w + p))
    return box.astype(dtype)[None, :, :, None]  # [1, H, W, 1]


def expanded_lip_box(lip_h: int, lip_w: int, lip_x: int, lip_y: int,
                     divisor: int = 5):
    """(x0, x1, y0, y1) half-open bounds of the expanded lip rectangle
    (tf_nerf.py:354-364): rows [y-p, y+lh+2p), cols [x-p, x+lw+p),
    p = lip_w // divisor."""
    p = lip_w // divisor
    return (lip_x - p, lip_x + lip_w + p, lip_y - p, lip_y + lip_h + 2 * p)


def _sample_box_region(merged_canonical, grid_w, box, h: int, w: int,
                       use_pallas: bool = False,
                       pallas_gather: bool = False):
    """Sample the warped image over the window.

    Only values whose bilinear footprint touches the expanded lip box are
    consumed (the blend multiplies by the box-coverage mask), so when the
    box + 1px halo is interior to the image, sampling runs through the
    MXU one-hot contraction over the small crop — fully fused in VMEM via
    the Pallas kernel (ops/pallas/window_sample, inference-only;
    ops/pallas/hat_sample when gradients are needed), or as XLA einsums
    (ops/grid_sample.grid_sample_onehot, differentiable) — instead of a
    per-element gather."""
    b = merged_canonical.shape[0]
    x0b, x1b, y0b, y1b = box
    if x0b - 1 >= 0 and y0b - 1 >= 0 and x1b + 1 <= w and y1b + 1 <= h:
        src = jax.lax.slice(merged_canonical,
                            (0, y0b - 1, x0b - 1, 0),
                            (b, y1b + 1, x1b + 1, merged_canonical.shape[3]))
        bb, wh, ww, _ = grid_w.shape
        flat = grid_w.reshape(bb, wh * ww, 2)
        if use_pallas:
            from speech2lip_tpu.ops.pallas.window_sample import window_sample
            out = window_sample(src, flat, y0b - 1, x0b - 1, h, w)
        elif pallas_gather:
            from speech2lip_tpu.ops.pallas.hat_sample import hat_sample
            out = hat_sample(src, flat, y0b - 1, x0b - 1, h, w)
        else:
            out = grid_sample_onehot(src, flat, y0b - 1, x0b - 1, h, w)
        return out.reshape(bb, wh, ww, -1)
    return grid_sample(merged_canonical, grid_w, padding_mode="zeros")


def post_fusion_composite(rgb_lip, face_canonical, rgb_gt, mask_lip,
                          coord, lip_x: int, lip_y: int,
                          expand_divisor: int = 5,
                          blackaug_noise: Optional[tuple] = None,
                          window: Optional[tuple] = None,
                          use_pallas: bool = False,
                          static_warp: Optional[tuple] = None,
                          pallas_gather: bool = False):
    """Composite the rendered lip into the observed-pose face.

    Mirrors post_fusion2_onlylip_light (tf_nerf.py:320-386) up to (but not
    including) the U-Net:
      paste+blend in canonical space -> expanded box mask -> backward-warp via
      ``coord`` -> binarize warped mask -> optional black-hole aug -> blend
      with the observed ground truth.

    TPU-first redesign of the warp stage: the warped mask is the closed-form
    ``warp_box_mask`` (no gather), and with a static ``window`` the image
    gather runs only on the observed-space rows/cols that can contain warped
    lip pixels — the blend everywhere else is identically ``rgb_gt``.  The
    caller must validate the window against the dataset's coord grids
    (data.windows.compute_warp_window); ``window=None`` is the always-safe
    full-frame path.  The blackaug branch (train only) needs the full-frame
    warp and ignores ``window``.

    Args:
      rgb_lip: [B, lh, lw, 3]; face_canonical/rgb_gt/mask_lip: [B, H, W, 3];
      coord: [B, H, W, 2] canonical→observed grid in [-1, 1];
      blackaug_noise: optional (noise1 [B,H,W,1], noise2 [B,H,W,1], apply
        bool) from train.losses.black_hole_noise;
      window: optional static (y0, x0, h, w) observed-space crop;
      static_warp: optional (warped_base [B,H,W,3], face_mask_obs
        [B,H,W,3]) — the canonical face and its >0 mask warped by
        ``coord`` on the HOST (ops.grid_sample.grid_sample_np; both are
        dataset constants per frame).  With a validated ``window`` this
        replaces blackaug's two full-frame on-device gathers (the
        dominant train-step cost on TPU: ~110 ms/frame at 500²) exactly:
        outside the window every sampled position lies outside the
        expanded box where merged_canonical ≡ face_canonical.
      pallas_gather: run the remaining differentiable window gather
        through ops/pallas/hat_sample (TPU): its backward w.r.t. the
        source is dense MXU matmuls instead of a 500² scatter-add.
    Returns:
      (unet_input [B, H, W, 3], rgb_gt' possibly noise-swapped,
       merged_canonical [B, H, W, 3]).
    """
    b, lh, lw, _ = rgb_lip.shape
    h, w = face_canonical.shape[1:3]
    merged_canonical = paste_lip(rgb_lip, face_canonical, mask_lip,
                                 lip_x, lip_y)
    box = expanded_lip_box(lh, lw, lip_x, lip_y, expand_divisor)

    if window is not None and blackaug_noise is None:
        wy0, wx0, wh, ww = window
        grid_w = jax.lax.slice(coord, (0, wy0, wx0, 0),
                               (b, wy0 + wh, wx0 + ww, 2))
        rgb_merged_w = _sample_box_region(merged_canonical, grid_w, box, h, w,
                                          use_pallas=use_pallas,
                                          pallas_gather=pallas_gather)
        mask_w = warp_box_mask(grid_w, box, h, w).astype(rgb_merged_w.dtype)
        gt_w = jax.lax.slice(rgb_gt, (0, wy0, wx0, 0),
                             (b, wy0 + wh, wx0 + ww, 3))
        blended = mask_w * rgb_merged_w + (1.0 - mask_w) * gt_w
        unet_input = jax.lax.dynamic_update_slice(
            rgb_gt, blended.astype(rgb_gt.dtype), (0, wy0, wx0, 0))
        return unet_input, rgb_gt, merged_canonical

    if window is not None and blackaug_noise is not None:
        # exact gradient windowing: outside the validated window the warp
        # samples canonical locations outside the expanded box, where
        # merged_canonical ≡ face_canonical (no rgb_lip dependence) — so the
        # full-frame gather can be gradient-free and only the window slice
        # carries gradients (kills the 500²-scatter backward of the gather)
        wy0, wx0, wh, ww = window
        if static_warp is not None:
            full = jax.lax.stop_gradient(
                static_warp[0].astype(merged_canonical.dtype))
        else:
            full = grid_sample(jax.lax.stop_gradient(merged_canonical),
                               coord, padding_mode="zeros")
        grid_w = jax.lax.slice(coord, (0, wy0, wx0, 0),
                               (b, wy0 + wh, wx0 + ww, 2))
        if pallas_gather:
            # dense-MXU differentiable sampler: the gather's scatter-add
            # backward w.r.t. merged_canonical becomes one matmul per
            # channel (ops/pallas/hat_sample)
            from speech2lip_tpu.ops.pallas.hat_sample import hat_sample
            win = hat_sample(merged_canonical,
                             grid_w.reshape(b, wh * ww, 2)
                             ).reshape(b, wh, ww, 3)
            win = win.astype(full.dtype)
        else:
            win = grid_sample(merged_canonical, grid_w, padding_mode="zeros")
        rgb_merged = jax.lax.dynamic_update_slice(full, win, (0, wy0, wx0, 0))
    else:
        rgb_merged = grid_sample(merged_canonical, coord, padding_mode="zeros")
    mask_warped = warp_box_mask(coord, box, h, w).astype(rgb_merged.dtype)

    if blackaug_noise is not None:
        noise1, noise2, apply = blackaug_noise
        if static_warp is not None and window is not None:
            mask_face_obs = static_warp[1].astype(rgb_merged.dtype)
        else:
            mask_face_canonical = (face_canonical > 0).astype(rgb_merged.dtype)
            mask_face_obs = grid_sample(mask_face_canonical, coord,
                                        padding_mode="zeros")
            mask_face_obs = (mask_face_obs == 1).astype(rgb_merged.dtype)
        # noise == 0 inside the face mask, 1 elsewhere (tf_nerf.py:306-318)
        n1 = jnp.where(mask_face_obs > 0, noise1, 1.0)
        n2 = jnp.where(mask_face_obs > 0, noise2, 1.0)
        rgb_merged_before = rgb_merged
        rgb_merged_aug = n1 * rgb_merged_before + (1 - n1) * rgb_gt
        rgb_gt_aug = n2 * rgb_gt + (1 - n2) * rgb_merged_before
        rgb_merged = jnp.where(apply, rgb_merged_aug, rgb_merged)
        rgb_gt = jnp.where(apply, rgb_gt_aug, rgb_gt)

    unet_input = mask_warped * rgb_merged + (1.0 - mask_warped) * rgb_gt
    return unet_input, rgb_gt, merged_canonical
