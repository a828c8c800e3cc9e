"""Jitted frame renderer: audio window → composited 500² face frame.

The TPU-native inference path (reference inference.py:140-178, call stack
SURVEY.md §3.2), redesigned rather than ported:

- the audio encoder runs **once per frame** (the reference tiles the raw
  window to all 9600 rays and re-encodes it 9600×, inference.py:144-151);
- the whole pipeline — encoder, pixel MLP (Pallas fused kernel on TPU),
  paste/blend/backward-warp compositing, post-fusion U-Net — is one jitted
  XLA program per batch of frames; no host round-trips between stages;
- batch axis = frames, the natural data-parallel unit (SURVEY.md §2.10):
  the same program pjit-shards over a device mesh for multi-chip serving.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from speech2lip_tpu.models import talking_face as tf
from speech2lip_tpu.models import unet_light
from speech2lip_tpu.ops import nn as snn
from speech2lip_tpu.ops.coords import get_coords
from speech2lip_tpu.ops.embedders import fourier_embed, time_embed


def batched_frame_feature(params, audio_codes: jnp.ndarray,
                          t_indices: jnp.ndarray):
    """Per-frame constant trunk inputs for a batch of frames.

    audio_codes: [B, 64]; t_indices: [B] float.
    Returns (base [B, W], skip [B, W]).
    """
    t_emb = jax.vmap(lambda t: time_embed(t, tf.TIME_DIM))(
        t_indices.astype(jnp.float32)).astype(audio_codes.dtype)
    base = (snn.linear(params["fc_audio"], audio_codes)
            + snn.linear(params["fc_time"], t_emb))
    skip = (snn.linear(params["fc_audio_skip"], audio_codes)
            + snn.linear(params["fc_time_skip"], t_emb))
    return base, skip


def render_lip_batch(params, audio: jnp.ndarray, t_indices: jnp.ndarray,
                     height: int, width: int, uv_multires: int = 10,
                     use_pallas: bool = False,
                     compute_dtype=jnp.float32) -> jnp.ndarray:
    """Render the canonical lip crop for a batch of frames (no ensemble —
    eval path, reference inference.py:144-159).

    audio: [B, 16, 29]; t_indices: [B].
    Returns [B, height, width, 3] float32.
    """
    codes = tf.encode_audio(params, audio.astype(compute_dtype))
    base, skip = batched_frame_feature(params, codes, t_indices)
    coords = get_coords(width, height, dtype=compute_dtype)   # [N, 2]
    uv_emb = fourier_embed(coords, uv_multires)               # [N, 42]
    if use_pallas:
        from speech2lip_tpu.ops.pallas.fused_mlp import fused_mlp_batched
        out = fused_mlp_batched(params, uv_emb, base, skip)
    else:
        out = tf.mlp_trunk(params, uv_emb[None], base[:, None, :],
                           skip[:, None, :])
    return out.reshape(out.shape[0], height, width, 3).astype(jnp.float32)


def render_face_batch(params, unet_params, unet_state, batch: Dict[str, Any],
                      *, lip_x: int, lip_y: int, lip_h: int, lip_w: int,
                      expand_divisor: int = 5, use_pallas: bool = False,
                      compute_dtype=jnp.float32,
                      window: Optional[tuple] = None) -> Dict[str, jnp.ndarray]:
    """Full inference step for a batch of frames.

    batch keys: audio [B,16,29], index [B], rgb_face_zero [B,H,W,3],
    rgb_face_ori [B,H,W,3], mask_lip_canonical [B,H,W,3], coord [B,H,W,2].

    ``window``: optional static (y0, x0, h, w) observed-space crop that is
    guaranteed (validated via data.windows.compute_warp_window) to contain
    all warped-lip pixels — restricts the warp gather to the lip region.

    Returns dict with 'lip' [B,lh,lw,3] and 'face' [B,H,W,3] (post-fusion
    output, reference inference.py:161-178).
    """
    rgb_lip = render_lip_batch(params, batch["audio"],
                               batch["index"].astype(jnp.float32),
                               lip_h, lip_w, use_pallas=use_pallas,
                               compute_dtype=compute_dtype)
    # composite in the compute dtype (the coord grid stays fp32 — sub-pixel
    # warp positions need the mantissa)
    cast = lambda x: x.astype(compute_dtype)
    unet_in, _, _ = tf.post_fusion_composite(
        cast(rgb_lip), cast(batch["rgb_face_zero"]),
        cast(batch["rgb_face_ori"]), cast(batch["mask_lip_canonical"]),
        batch["coord"], lip_x, lip_y,
        expand_divisor=expand_divisor, window=window,
        use_pallas=use_pallas)
    unet_in = unet_in.astype(compute_dtype)
    if use_pallas and compute_dtype == jnp.bfloat16 \
            and unet_in.shape[1] % 4 == 0 and unet_in.shape[2] % 4 == 0 \
            and unet_in.shape[1] <= 1024 and unet_in.shape[2] <= 1024:
        # fully-fused Pallas U-Net (pool/upsample/concat folded into the
        # DoubleConv kernels): ~1.4x the XLA graph at May geometry.
        # bf16-only: the fused kernels' f32 dots run at HIGHEST precision
        # (6-pass) for parity, which loses to XLA's f32 convs — fp32
        # serving keeps the XLA graph.
        # %4 geometry: both pool levels and the exact-2x upsamples need
        # even sizes at every stage (odd halves would corrupt the
        # pooled-lane halo and the closed-form row lerp).
        # <=1024px: bound of the kernels' raised 100 MB VMEM budget
        # (conv_hcw._VMEM_LIMIT; the old 16 MB default capped this path
        # at 500px) — measured vs XLA bf16 at batch 8-16: 512² 36.8 vs
        # 39.7 ms, 768² 39.6 vs 45.9, 1024² 68.2 vs 79.8, max|diff| 8e-4
        face = unet_light.apply_infer_fused(unet_params, unet_state,
                                            unet_in)
    else:
        face, _ = unet_light.apply(unet_params, unet_state, unet_in,
                                   train=False)
    return {"lip": rgb_lip, "face": face.astype(jnp.float32)}


class Renderer:
    """Compiled renderer bound to a config's static geometry.

    The Pallas fused-MLP path is tried first off-CPU; if the kernel fails to
    lower/compile on this backend (e.g. a Mosaic tiling regression), the
    first call falls back to the pure-XLA graph — loudly, never fatally.
    """

    def __init__(self, cfg: Dict[str, Any], params, unet_params, unet_state,
                 use_pallas: Optional[bool] = None,
                 window: Optional[tuple] = None):
        d = cfg["data"]
        self.lip_h = int(d["height"])
        self.lip_w = int(d["width"])
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        if window is None:
            window = d.get("warp_window")
        compute_dtype = jnp.dtype(cfg["model"].get("compute_dtype", "float32"))
        if compute_dtype != jnp.float32:
            cast = lambda t: jax.tree.map(
                lambda x: x.astype(compute_dtype)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
            params, unet_params, unet_state = (cast(params),
                                               cast(unet_params),
                                               cast(unet_state))
        self._params = (params, unet_params, unet_state)
        self.use_pallas = bool(use_pallas)

        def make_fn(pallas: bool):
            return jax.jit(functools.partial(
                render_face_batch,
                expand_divisor=int(d.get("expand_mask_divisor", 5)),
                use_pallas=pallas, compute_dtype=compute_dtype,
                window=tuple(window) if window is not None else None,
            ), static_argnames=("lip_x", "lip_y", "lip_h", "lip_w"))

        self._make_fn = make_fn
        self._fn = make_fn(self.use_pallas)

    def __call__(self, batch: Dict[str, Any], lip_x: int, lip_y: int):
        p, up, us = self._params
        kw = dict(lip_x=int(lip_x), lip_y=int(lip_y),
                  lip_h=self.lip_h, lip_w=self.lip_w)
        if not self.use_pallas:
            return self._fn(p, up, us, batch, **kw)
        try:
            return self._fn(p, up, us, batch, **kw)
        except Exception as e:  # kernel failed to lower/compile on this chip
            import logging
            logging.getLogger("speech2lip").warning(
                "Pallas render path failed on backend %s (%s: %s); "
                "falling back to the XLA graph permanently for this "
                "Renderer", jax.default_backend(), type(e).__name__, e)
            self.use_pallas = False
            self._fn = self._make_fn(False)
            return self._fn(p, up, us, batch, **kw)
