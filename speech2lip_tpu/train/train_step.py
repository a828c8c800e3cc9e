"""Jitted training step: the whole optimization step as one XLA program.

TPU-native redesign of the reference's ``Trainer.train_stage1``
(reference src/face_simple/training.py:141-574, call stack SURVEY.md §3.1):

- the LIIF 4-offset ensemble is one batched matmul chain (leading axis), not
  4 sequential forwards (training.py:204-239);
- audio/time projections are computed once per frame, not once per ray;
- loss staging (sync loss + post-net freeze after ``sync_start_iter``,
  reference train.py:188-197, training.py:491) is a **static** flag: the
  outer loop re-jits once at the boundary instead of branching per step;
- gradients reduce across the device mesh via jit sharding (params
  replicated, batch sharded on the frame axis) — the NCCL DDP equivalent
  (SURVEY.md §5 "Distributed communication backend");
- randomness is threaded through explicit PRNG keys.

Whole-frame optimizer steps: the reference steps per ray-chunk
(training.py:404,559) but for the production config batch_rays = H·W, so one
step per frame — identical semantics, documented divergence otherwise.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from speech2lip_tpu.models import talking_face as tf
from speech2lip_tpu.models import unet_light
from speech2lip_tpu.models import syncnet as syncnet_mod
from speech2lip_tpu.ops.coords import ensemble_coords, get_coords
from speech2lip_tpu.ops.embedders import fourier_embed
from speech2lip_tpu.ops.geometry import (intrinsics, inverse_warp,
                                         rel_pose_obs2can, warp_grid_crop)
from speech2lip_tpu.ops.grid_sample import grid_sample_onehot_border
from speech2lip_tpu.train import losses
from speech2lip_tpu.infer.renderer import batched_frame_feature


class TrainState(NamedTuple):
    params: Any          # talking_face params (incl. canonical_depth)
    unet_params: Any
    unet_state: Any      # BN running stats
    opt_state: Any
    it: jnp.ndarray      # int32 iteration counter


@dataclass(frozen=True)
class StepStatics:
    """Static (compile-time) geometry and staging flags."""
    lip_h: int
    lip_w: int
    lip_x: int
    lip_y: int
    face_h: int
    face_w: int
    focal: float
    expand_divisor: int = 5
    w_photometric: float = 1.0
    w_perceptual: float = 0.01
    w_post_fusion: float = 1.0
    w_sync: float = 0.01
    use_perceptual: bool = True
    use_canonical_depth_loss: bool = True
    use_blackaug: bool = True
    sync_on: bool = False          # it > sync_start_iter
    postnet_frozen: bool = False   # it > postnet_freeze_iter
    sync_T: int = 5
    face_bbox: Tuple[int, int, int, int] = (0, 0, 96, 96)  # x, y, x2, y2
    ensemble: bool = True
    window: Optional[Tuple[int, int, int, int]] = None  # validated warp win
    # static bbox (x0, x1, y0, y1) of the canonical-depth loss mask's
    # support: the masked MSE is exactly zero outside it, so the warp +
    # sampling run only on the crop, and the sampling rides the MXU
    # (grid_sample_onehot_border) instead of 4 serialized gathers.
    # None = full-frame gather path (used when masks are unavailable).
    depth_loss_box: Optional[Tuple[int, int, int, int]] = None
    add_noise_uv: bool = False      # gaussian uv jitter (training.py:259)
    add_noise_audio: bool = False   # gaussian audio-code noise (training.py:213-216)
    compute_dtype: str = "float32"  # 'bfloat16' = mixed precision: fp32
                                    # master params/Adam, bf16 forward/grads
    # TPU fast path for the step's two XLA-hostile gathers (the blackaug
    # window gather's scatter-add backward and the depth-loss warp): ride
    # ops/pallas/hat_sample (dense-MXU custom-VJP sampler).  Weights
    # quantize at 2^-9 in bf16 — kept off for the f32 parity path.
    pallas_gather: bool = False


def render_lip_ensemble(params, audio: jnp.ndarray, t_indices: jnp.ndarray,
                        key, st: StepStatics) -> jnp.ndarray:
    """Train-time lip render with the 4-offset local ensemble.

    audio: [B, 16, 29]; returns [B, lip_h, lip_w, 3].
    """
    b = audio.shape[0]
    key, k_uv, k_audio = jax.random.split(key, 3)
    codes = tf.encode_audio(params, audio)
    if st.add_noise_audio:
        # reference adds std-0.01 noise to the per-ray audio code
        # (training.py:213-216; accumulation across ensemble offsets there is
        # a reference quirk — applied once per frame here)
        codes = codes + 0.01 * jax.random.normal(k_audio, codes.shape)
    base, skip = batched_frame_feature(params, codes, t_indices)
    coords = get_coords(st.lip_w, st.lip_h,
                        noise_key=k_uv if st.add_noise_uv else None,
                        raw_noise_std=0.5 / st.lip_w)        # [N, 2]
    if not st.ensemble:
        uv_emb = fourier_embed(coords, 10)
        out = tf.mlp_trunk(params, uv_emb[None], base[:, None, :],
                           skip[:, None, :])
        return out.reshape(b, st.lip_h, st.lip_w, 3)
    # per-frame eps noise: (0.5/H)*rand/2 (reference training.py:198-200)
    eps = (0.5 / st.lip_h) * jax.random.uniform(key, (b,)) / 2.0
    shifted, weights = jax.vmap(
        lambda e: ensemble_coords(coords, st.lip_w, st.lip_h, e))(eps)
    # shifted: [B, 4, N, 2]; weights: [B, 4, N]
    uv_emb = fourier_embed(shifted, 10)                      # [B, 4, N, 42]
    out = tf.mlp_trunk(params, uv_emb, base[:, None, None, :],
                       skip[:, None, None, :])               # [B, 4, N, 3]
    rgb = jnp.sum(out * weights[..., None], axis=1)          # [B, N, 3]
    return rgb.reshape(b, st.lip_h, st.lip_w, 3)


def _fuse_frame(params, unet_params, unet_state, rgb_lip, batch, coord,
                key, st: StepStatics, blackaug: bool, mesh=None):
    """Post-fusion composite + U-Net for a batch of frames.

    With ``mesh`` (a 2-D (data, pixel) mesh), the 500² face tensors carry a
    sharding constraint over (batch=data, rows=pixel): the SPMD partitioner
    spatially partitions the compositing + U-Net convs with halo exchanges —
    the intra-frame (SP) axis complementing frame DP (SURVEY.md §2.10).
    """
    noise = None
    static_warp = None
    if blackaug:
        k1, k2, k3 = jax.random.split(key, 3)
        shape = batch["rgb_face_zero"].shape[:3] + (1,)
        apply = jax.random.uniform(k3, ()) > 0.5  # 50% of steps (tf_nerf.py:371)
        noise = (losses.black_hole_noise(k1, shape),
                 losses.black_hole_noise(k2, shape), apply)
        if st.window is not None and "warped_base" in batch:
            # host-precomputed static warps (dataset constants × coord) —
            # replaces the step's two full-frame gathers, bit-exactly
            static_warp = (batch["warped_base"],
                           batch["blackaug_face_mask"])
    unet_in, _, _ = tf.post_fusion_composite(
        rgb_lip, batch["rgb_face_zero"], batch["rgb_face_ori"],
        batch["mask_lip_canonical"], coord, st.lip_x, st.lip_y,
        expand_divisor=st.expand_divisor, blackaug_noise=noise,
        window=st.window, static_warp=static_warp,
        pallas_gather=st.pallas_gather)
    if mesh is not None:
        from speech2lip_tpu.parallel.mesh import pixel_sharded
        unet_in = pixel_sharded(unet_in, mesh)
    train_bn = not st.postnet_frozen
    # the fp32 coord grid / box mask promote the blend back to fp32 in mixed
    # mode — realign with the conv weights' dtype
    unet_in = unet_in.astype(jax.tree.leaves(unet_params)[0].dtype)
    face, new_unet_state = unet_light.apply(unet_params, unet_state, unet_in,
                                            train=train_bn)
    return face, new_unet_state


def compute_losses(params, unet_params, unet_state, frozen, batch, key,
                   st: StepStatics, mesh=None):
    """Full loss dict for one batch (reference train_stage1).

    frozen: dict with 'lpips' and optional 'syncnet' (params, state).
    Returns (total_loss, (metrics, new_unet_state)).
    """
    metrics: Dict[str, jnp.ndarray] = {}
    keys = jax.random.split(key, 8)
    b = batch["audio"].shape[0]
    t_idx = batch["index"].astype(jnp.float32)

    if st.compute_dtype != "float32":
        # mixed precision: cast params + image inputs; the cast's gradient
        # upcasts back, so master params and Adam stay fp32
        cd = jnp.dtype(st.compute_dtype)
        cast = lambda t: jax.tree.map(
            lambda x: x.astype(cd)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
        params = dict(cast(params))
        # the learned canonical depth drives geometry — keep it fp32
        if "canonical_depth" in params:
            params["canonical_depth"] = params["canonical_depth"].astype(
                jnp.float32)
        unet_params = cast(unet_params)
        unet_state = cast(unet_state)  # eval-mode BN stats must match
        batch = {k: (v.astype(cd) if hasattr(v, "dtype")
                     and v.dtype == jnp.float32
                     and k not in ("coord", "coord_window", "euler", "trans",
                                   "canonical_euler", "canonical_trans")
                     else v)
                 for k, v in batch.items()}

    if st.postnet_frozen:
        unet_params = jax.lax.stop_gradient(unet_params)

    # 1. lip render + photometric + perceptual (training.py:414-421)
    rgb_lip = render_lip_ensemble(params, batch["audio"], t_idx, keys[0], st)
    loss_rgb_lip = losses.photometric_loss(rgb_lip, batch["rgb"],
                                           weight=st.w_photometric)
    total = loss_rgb_lip
    loss_rgb_metric = loss_rgb_lip
    # AlexNet-LPIPS needs ≥ ~32px inputs; tiny lip configs keep the face
    # perceptual term and skip the lip one (the reference would crash here)
    if st.use_perceptual and min(st.lip_h, st.lip_w) >= 32:
        lp = losses.perceptual_loss(frozen["lpips"],
                                    rgb_lip.astype(jnp.float32),
                                    batch["rgb"].astype(jnp.float32),
                                    weight=st.w_perceptual)
        total = total + lp
        metrics["loss_perceptual_lip"] = lp

    # 2. post-fusion face + losses (training.py:424-459)
    face, new_unet_state = _fuse_frame(
        params, unet_params, unet_state, rgb_lip, batch, batch["coord"],
        keys[1], st, blackaug=st.use_blackaug, mesh=mesh)
    loss_rgb_face = losses.photometric_loss(
        face, batch["rgb_face_ori"],
        weight=st.w_photometric * st.w_post_fusion)
    total = total + loss_rgb_face
    loss_rgb_metric = loss_rgb_metric + loss_rgb_face
    if st.use_perceptual:
        lpf = losses.perceptual_loss(frozen["lpips"],
                                     face.astype(jnp.float32),
                                     batch["rgb_face_ori"].astype(jnp.float32),
                                     weight=st.w_perceptual * st.w_post_fusion)
        total = total + lpf
        metrics["loss_perceptual_face"] = lpf

    # 3. canonical-depth photometric v2 (training.py:462-477)
    if st.use_canonical_depth_loss:
        k = jnp.asarray(intrinsics(st.focal, st.face_h, st.face_w))
        inv_k = jnp.linalg.inv(k)
        depth = params["canonical_depth"]

        if st.depth_loss_box is not None:
            # fast path: the loss mask is a per-identity dataset constant
            # whose support lies inside st.depth_loss_box, so sum(err*mask)
            # and sum(mask) over the crop equal the full-frame sums — the
            # loss value is EXACTLY the slow path's.  The source sampling
            # (whose grid depends on the learned depth and cannot move to
            # the host) runs as MXU one-hot contractions.
            x0, x1, y0, y1 = st.depth_loss_box
            rel = rel_pose_obs2can(
                batch["canonical_euler"], batch["canonical_trans"],
                batch["euler"], batch["trans"])
            grid = jax.vmap(lambda r: warp_grid_crop(
                depth, r, k, inv_k, st.depth_loss_box,
                st.face_h, st.face_w))(rel)
            bsz = grid.shape[0]
            if st.pallas_gather:
                from speech2lip_tpu.ops.pallas.hat_sample import hat_sample
                pred_canonical = hat_sample(
                    batch["rgb_face_ori"], grid.reshape(bsz, -1, 2),
                    border=True)
            else:
                pred_canonical = grid_sample_onehot_border(
                    batch["rgb_face_ori"], grid.reshape(bsz, -1, 2))
            pred_canonical = pred_canonical.reshape(
                bsz, y1 - y0, x1 - x0, -1)
            loss_mask = (batch["mask_head_canonical"][:, y0:y1, x0:x1]
                         * (1.0 - batch["mask_face_canonical"][:, y0:y1,
                                                               x0:x1]))
            ld = losses.photometric_loss(
                pred_canonical, batch["rgb_face_zero"][:, y0:y1, x0:x1],
                mask=loss_mask)
        elif st.pallas_gather and "depth_pts" in frozen:
            # points path: the loss mask head*(1-face) is a per-identity
            # DATASET CONSTANT, and so is the target rgb_face_zero — so
            # the warp, the sample, and the masked MSE only ever need the
            # mask's support points (frozen['depth_pts'], built by the
            # trainer).  Cuts the hat contraction cost by HW/S (~4-8× at
            # May geometry) with the identical per-point math:
            # warp_grid_points == backproject_depth∘project_3d at (ys,xs)
            # and sum(err·w)/sum(w) over the support == the full-frame
            # masked MSE (mask is zero elsewhere).
            from speech2lip_tpu.ops.geometry import warp_grid_points
            from speech2lip_tpu.ops.pallas.hat_sample import hat_sample
            dp = frozen["depth_pts"]
            xs_i, ys_i = dp["xs"], dp["ys"]                    # [S]
            w = dp["w"]                                        # [S, C]
            depth_pts = depth.reshape(-1)[ys_i * st.face_w + xs_i]

            def grid_pts(euler, trans, can_euler, can_trans):
                rel = rel_pose_obs2can(can_euler[None], can_trans[None],
                                       euler[None], trans[None])[0]
                return warp_grid_points(depth_pts, xs_i, ys_i, rel, k,
                                        inv_k, st.face_h, st.face_w)

            grids = jax.vmap(grid_pts)(
                batch["euler"], batch["trans"],
                batch["canonical_euler"], batch["canonical_trans"])
            pred_pts = hat_sample(batch["rgb_face_ori"], grids,
                                  border=True)                 # [B, S, C]
            tgt = dp["rgb_zero_pts"].astype(pred_pts.dtype)
            ld = losses.photometric_loss(
                pred_pts, jnp.broadcast_to(tgt[None], pred_pts.shape),
                mask=jnp.broadcast_to(w[None].astype(pred_pts.dtype),
                                      pred_pts.shape))
        elif st.pallas_gather:
            from speech2lip_tpu.ops.geometry import (backproject_depth,
                                                     project_3d)
            from speech2lip_tpu.ops.pallas.hat_sample import hat_sample
            cam = backproject_depth(depth, inv_k)

            def grid_one(euler, trans, can_euler, can_trans):
                rel = rel_pose_obs2can(can_euler[None], can_trans[None],
                                       euler[None], trans[None])[0]
                grid, _ = project_3d(cam, k, rel, st.face_h, st.face_w)
                return grid

            grids = jax.vmap(grid_one)(
                batch["euler"], batch["trans"],
                batch["canonical_euler"], batch["canonical_trans"])
            bsz = grids.shape[0]
            pred_canonical = hat_sample(
                batch["rgb_face_ori"], grids.reshape(bsz, -1, 2),
                border=True).reshape(bsz, st.face_h, st.face_w, -1)
            loss_mask = (batch["mask_head_canonical"]
                         * (1.0 - batch["mask_face_canonical"]))
            ld = losses.photometric_loss(pred_canonical,
                                         batch["rgb_face_zero"],
                                         mask=loss_mask)
        else:
            def warp_one(face_gt, euler, trans, can_euler, can_trans):
                rel = rel_pose_obs2can(can_euler[None], can_trans[None],
                                       euler[None], trans[None])[0]
                warped, _ = inverse_warp(face_gt, depth, rel, k, inv_k)
                return warped

            pred_canonical = jax.vmap(warp_one)(
                batch["rgb_face_ori"], batch["euler"], batch["trans"],
                batch["canonical_euler"], batch["canonical_trans"])
            loss_mask = (batch["mask_head_canonical"]
                         * (1.0 - batch["mask_face_canonical"]))
            ld = losses.photometric_loss(pred_canonical,
                                         batch["rgb_face_zero"],
                                         mask=loss_mask)
        total = total + ld
        metrics["loss_canonical_depth_photo"] = ld

    # 4. SyncNet contrastive loss (training.py:491-557, it > 100k)
    if st.sync_on and "syncnet" in frozen:
        sync_p, sync_s = frozen["syncnet"]
        n_total = batch["total_frame"].astype(jnp.float32)

        # The reference re-renders the T=5 window frames in a Python loop
        # (training.py:496-534).  Here T folds into the batch axis: ONE
        # render + composite + U-Net at batch B*T instead of T unrolled
        # batch-B programs — the fused U-Net and the window gather both
        # amortize with batch, so the fold is where the staged step's
        # extra cost over stage-1 goes.  Per-frame math is unchanged; the
        # ensemble eps / uv / audio noise draws are one [B*T] stream
        # instead of T folded [B] streams (same distribution).
        T = st.sync_T
        offs = jnp.arange(T, dtype=jnp.float32)
        cur_t = jnp.minimum(
            batch["index"].astype(jnp.float32)[:, None] + offs[None, :],
            n_total[:, None] - 1.0)                          # [B, T]
        aw = batch["audio_window"][:, :T]
        lip_bt = render_lip_ensemble(
            params, aw.reshape((b * T,) + aw.shape[2:]),
            cur_t.reshape(-1), keys[2], st)                  # [B*T, lh, lw, 3]

        def _tile(x):  # [B, ...] -> [B*T, ...] (b-major, matches reshape)
            return jnp.broadcast_to(
                x[:, None], (b, T) + x.shape[1:]).reshape(
                    (b * T,) + x.shape[1:])

        cw = batch["coord_window"][:, :T]
        unet_in, _, _ = tf.post_fusion_composite(
            lip_bt, _tile(batch["rgb_face_zero"]),
            _tile(batch["rgb_face_ori"]),
            _tile(batch["mask_lip_canonical"]),
            cw.reshape((b * T,) + cw.shape[2:]), st.lip_x, st.lip_y,
            expand_divisor=st.expand_divisor, window=st.window,
            pallas_gather=st.pallas_gather)
        fused, _ = unet_light.apply(unet_params, unet_state, unet_in,
                                    train=False)
        x0, y0, x1, y1 = st.face_bbox
        crop = fused[:, y0:y1, x0:x1, :]
        crop = jax.image.resize(crop, (b * T, 96, 96, 3), method="linear")
        rgb_window = crop.reshape(b, T, 96, 96, 3)

        g_pos = losses.sync_window_to_syncnet_input(
            rgb_window.astype(jnp.float32))
        mel = jnp.transpose(batch["mel"].astype(jnp.float32),
                            (0, 2, 3, 1))  # [B,80,16,1]
        a_pos, v_pos, _ = syncnet_mod.apply(sync_p, sync_s, mel, g_pos)
        sl_pos = losses.cosine_bce_loss(a_pos, v_pos, jnp.ones((b,)))

        # negative window comes in reference layout [B, 3, T, 96, 96]
        neg = jnp.transpose(batch["rgb_window_neg"].astype(jnp.float32),
                            (0, 2, 3, 4, 1))
        g_neg = losses.sync_window_to_syncnet_input(neg)
        a_neg, v_neg, _ = syncnet_mod.apply(sync_p, sync_s, mel, g_neg)
        sl_neg = losses.cosine_bce_loss(a_neg, v_neg, jnp.zeros((b,)))

        ls = st.w_sync * (sl_pos + sl_neg)
        total = total + ls
        metrics["loss_sync"] = ls

    metrics["loss_rgb"] = loss_rgb_metric
    metrics["loss"] = total
    metrics["psnr"] = losses.psnr_from_mse(loss_rgb_metric)
    if st.compute_dtype != "float32":
        # master BN stats stay fp32 (a bf16 state would change the step's
        # input signature and force a recompile every iteration)
        new_unet_state = jax.tree.map(
            lambda x: x.astype(jnp.float32), new_unet_state)
    return total, (metrics, new_unet_state)


def make_train_step(optimizer: optax.GradientTransformation,
                    st: StepStatics, frozen, donate: bool = True, mesh=None):
    """Build the jitted train step.

    frozen: {'lpips': params, 'syncnet': (params, state)?} — closed over, so
    they are constants in the compiled program.  ``mesh``: optional 2-D
    (data, pixel) mesh enabling intra-frame spatial partitioning.
    """

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], key):
        def loss_fn(trainable):
            return compute_losses(trainable["model"], trainable["unet"],
                                  state.unet_state, frozen, batch, key, st,
                                  mesh=mesh)

        trainable = {"model": state.params, "unet": state.unet_params}
        grads, (metrics, new_unet_state) = jax.grad(
            loss_fn, has_aux=True)(trainable)
        if st.postnet_frozen:
            grads["unet"] = jax.tree.map(jnp.zeros_like, grads["unet"])
        # Global gradient L2 norm: training observability, and the
        # multichip dryrun's gradient-allreduce pin — quadratic in g, so a
        # missing or mis-scaled psum shifts it (comparing Adam-updated
        # params cannot catch scaling bugs: the step-1 update is
        # lr·sign(g), and noise-level grads flip whole lr-sized updates).
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, new_opt = optimizer.update(grads, state.opt_state, trainable)
        if st.postnet_frozen:
            # Zeroing the GRADS is not enough under Adam: its first-moment
            # buffer keeps emitting residual-momentum updates for ~1/(1-b1)
            # iterations past the boundary, and those few effective steps
            # on the BatchNorm scales/biases shift the frozen U-Net's
            # output globally (measured: 40 -> 21 dB rendered face PSNR
            # 800 iters after the freeze).  The reference freezes via
            # requires_grad=False (train.py:188-197), which makes torch's
            # Adam skip the params entirely — matched here by masking the
            # UPDATES so the frozen tree is bit-identical forever after.
            updates["unet"] = jax.tree.map(jnp.zeros_like, updates["unet"])
        new_trainable = optax.apply_updates(trainable, updates)
        new_state = TrainState(
            params=new_trainable["model"],
            unet_params=new_trainable["unet"],
            unet_state=new_unet_state,
            opt_state=new_opt,
            it=state.it + 1,
        )
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_chunked_train_step(optimizer: optax.GradientTransformation,
                            st: StepStatics, n_chunks: int,
                            donate: bool = True):
    """Per-ray-chunk optimizer stepping (reference training.py:404,559-561):
    ``batch_rays < H·W`` splits each frame's pixel set into chunks with an
    Adam step per chunk.

    This regime only carries the lip photometric loss: the reference's
    post-fusion / perceptual / sync / canonical-depth terms all reshape the
    chunk to the FULL lip image (training.py:432) and crash when
    batch_rays < H·W, so those flags are rejected by the caller.  Expressed
    TPU-natively as a ``lax.scan`` over chunks inside one jitted program —
    sequential parameter updates with no host round-trips.
    """
    n = st.lip_h * st.lip_w
    assert n % n_chunks == 0, (n, n_chunks)
    chunk = n // n_chunks

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], key):
        b = batch["audio"].shape[0]
        t_idx = batch["index"].astype(jnp.float32)
        coords = get_coords(st.lip_w, st.lip_h)              # [N, 2]
        rgb = batch["rgb"].reshape(b, n, 3)

        def chunk_body(carry, inp):
            params, opt_state = carry
            ci, k = inp
            sl = ci * chunk

            def loss_fn(p):
                codes = tf.encode_audio(p, batch["audio"])
                base, skip = batched_frame_feature(p, codes, t_idx)
                csl = jax.lax.dynamic_slice(coords, (sl, 0), (chunk, 2))
                tgt = jax.lax.dynamic_slice(rgb, (0, sl, 0), (b, chunk, 3))
                if st.ensemble:
                    eps = (0.5 / st.lip_h) * jax.random.uniform(k, (b,)) / 2.0
                    shifted, wts = jax.vmap(
                        lambda e: ensemble_coords(csl, st.lip_w, st.lip_h,
                                                  e))(eps)
                    out = tf.mlp_trunk(p, fourier_embed(shifted, 10),
                                       base[:, None, None, :],
                                       skip[:, None, None, :])
                    pred = jnp.sum(out * wts[..., None], axis=1)
                else:
                    pred = tf.mlp_trunk(p, fourier_embed(csl, 10)[None],
                                        base[:, None, :], skip[:, None, :])
                return losses.photometric_loss(pred, tgt,
                                               weight=st.w_photometric)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt = optimizer.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_opt), loss

        keys = jax.random.split(key, n_chunks)
        (new_params, new_opt), chunk_losses = jax.lax.scan(
            chunk_body, (state.params, state.opt_state),
            (jnp.arange(n_chunks), keys))
        loss_rgb = jnp.mean(chunk_losses)                    # /= times
        metrics = {"loss": loss_rgb, "loss_rgb": loss_rgb,
                   "psnr": losses.psnr_from_mse(loss_rgb)}
        new_state = TrainState(new_params, state.unet_params,
                               state.unet_state, new_opt, state.it + 1)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_optimizer(cfg) -> optax.GradientTransformation:
    """Adam + stepped LR decay (reference train.py:128,148-150).

    Note: the reference's MultiStepLR steps per *epoch* with milestones
    [200k, 400k] — which a May-sized run never reaches, so the effective
    reference LR is constant.  We expose the milestones in *iterations*
    (config 'scheduler_milestones'), a strict superset of behaviors.
    """
    tr = cfg["training"]
    lr = tr["learning_rate"]
    gamma = tr["scheduler_gamma"]
    milestones = tr["scheduler_milestones"]
    sched = optax.piecewise_constant_schedule(
        lr, {int(m): gamma for m in milestones})
    return optax.adam(sched)
