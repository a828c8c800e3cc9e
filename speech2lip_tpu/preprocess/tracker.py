"""3DMM face tracker: the 4-phase per-video fit, on XLA.

TPU-native rebuild of the reference tracker (reference
preprocess/face_tracker.py:213-533):
  find_focal  — grid-search focal 600→1500 step 100, per-candidate landmark
                fits (face_tracker.py:213-281);
  phase a     — pose-only landmark fit, all frames jointly (:327-346);
  phase b     — + id/exp with L2 regularizers (:349-374);
  phase c     — + photometric fit on ``batch_size`` key frames through the
                differentiable renderer (:377-436);
  phase d     — sliding-window refinement with a temporal Laplacian loss on
                rigid vertices (:441-530).

Each phase is a jitted ``lax.fori_loop`` of optax-Adam steps — the Python
per-iteration loop of the reference becomes one compiled program per phase.
Learning-rate drops at fixed iterations use optax schedules.  The
pytorch3d renderer is replaced by ops/rasterize + fixed-visibility
differentiable shading (re-rasterized every iteration).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from speech2lip_tpu.ops.rasterize import rasterize, recompute_barycentrics
from speech2lip_tpu.preprocess import face_3dmm as bfm


def cal_lan_loss(proj_lan, gt_lan):
    """Mean-squared landmark error (face_tracking/util.py:91-92)."""
    return jnp.mean((proj_lan - gt_lan) ** 2)


def cal_col_loss(pred_img, gt_img, mask):
    """Masked per-pixel color distance (util.py:94-99): mean over frames of
    sum(|pred-gt|_2 * mask)/255 / sum(mask)."""
    # +eps: d(sqrt)/dx at exactly-matching pixels would be NaN under autodiff
    dist = (jnp.sqrt(jnp.sum((pred_img - gt_img) ** 2, axis=3) + 1e-12)
            * mask / 255.0)
    return jnp.mean(jnp.sum(dist, axis=(1, 2))
                    / jnp.maximum(jnp.sum(mask, axis=(1, 2)), 1e-6))


def cal_lap_loss(x):
    """Temporal Laplacian smoothness: conv [-0.5, 1, -0.5] over the last
    axis, mean square (util.py:53-63).  x: [..., T]."""
    lap = x[..., 1:-1] - 0.5 * x[..., :-2] - 0.5 * x[..., 2:]
    return jnp.mean(lap ** 2)


def make_adam_runner(loss_fn, param_keys, lr_schedules, n_iters: int,
                     static_args=(), segment: int = None):
    """Build a REUSABLE jitted Adam loop: ``run(params, aux)``.

    One compile serves every subsequent call with the same shapes — the
    find_focal candidate grid and phase-d's sliding windows re-enter the
    same executable instead of re-tracing a fresh program each time.

    Large arrays (BFM bases, images, landmark tracks, the focal scalar)
    must flow through ``aux``: ``loss_fn`` is called as
    ``loss_fn(q, *aux, *static_args)`` and ``aux`` is a real jit argument.
    Closed-over arrays would be embedded in the lowered HLO as literal
    constants, which defeats compile caching AND bloats the compile
    payload (the axon remote-compile tunnel rejects >~128 MB programs;
    50 key frames at 500² alone are 150 MB).

    lr_schedules: {name: optax schedule or float} — one Adam per param with
    its own LR (the reference uses separate optimizers per group).

    ``segment``: max fori_loop iterations per DEVICE DISPATCH.  The loop's
    trip count is a traced argument (fori_loop with a dynamic bound), so
    the host re-enters ONE executable ceil(n_iters/segment) times with the
    Adam state carried over — iteration-for-iteration identical to a
    single dispatch (the schedules read the step count from the optimizer
    state, not the loop index).  Long single dispatches (phase c: 51
    iterations × 50 differentiable 500² renders ≈ minutes of device time)
    crash the tunneled TPU worker; bounding dispatch length keeps each
    call inside the worker's tolerance."""
    opts = {k: optax.adam(lr_schedules.get(k, 1e-2)) for k in param_keys}

    def body(aux, _, carry):
        p, s = carry
        grads = jax.grad(lambda q: loss_fn(q, *aux, *static_args))(p)
        new_p, new_s = {}, {}
        for k in p:
            upd, new_s[k] = opts[k].update(grads[k], s[k], p[k])
            new_p[k] = optax.apply_updates(p[k], upd)
        return new_p, new_s

    @jax.jit
    def run(p, s, aux, k):
        return jax.lax.fori_loop(0, k, functools.partial(body, aux), (p, s))

    def call(params, aux=()):
        p = params
        s = {k: opts[k].init(params[k]) for k in params}
        seg = n_iters if not segment else min(segment, n_iters)
        done = 0
        while done < n_iters:
            k = min(seg, n_iters - done)
            p, s = run(p, s, aux, jnp.int32(k))
            done += k
        return p

    return call


def _adam_loop(loss_fn, params: Dict[str, jnp.ndarray], lr_schedules,
               n_iters: int, static_args=(), aux=(), segment=None):
    """One-shot convenience wrapper over ``make_adam_runner``."""
    return make_adam_runner(loss_fn, list(params), lr_schedules, n_iters,
                            static_args, segment=segment)(params, aux)


@dataclass
class TrackerConfig:
    id_dim: int = 100
    exp_dim: int = 79
    tex_dim: int = 100
    img_h: int = 500
    img_w: int = 500
    batch_size: int = 50
    # iteration budgets (reference values; lower for tests)
    iters_focal_pose: int = 2000
    iters_focal_idexp: int = 2500
    iters_pose: int = 1500
    iters_idexp: int = 2000
    iters_photo: int = 71
    iters_window: int = 50
    # frames rendered at once inside the photometric losses (phases c/d).
    # The loss is a mean of per-frame scalars, so chunking is exact; the
    # whole-batch vmap materializes [B, H, W, 3, 3] barycentric-blend
    # intermediates in the backward pass — 19 GB at B=50/500², over HBM.
    photo_chunk: int = 4
    # max Adam iterations per device dispatch (make_adam_runner segment):
    # photometric iterations render photo_chunk×ceil(B/chunk) frames each,
    # landmark iterations are ~ms — both bounded to keep any single
    # dispatch well under the tunneled worker's watchdog.
    photo_segment: int = 8
    lms_segment: int = 500
    raster_kwargs: Dict[str, Any] = field(default_factory=dict)


class FaceTracker:
    def __init__(self, assets: bfm.BFMAssets, lms: np.ndarray,
                 cfg: TrackerConfig, mesh=None):
        """lms: [N, 68, 2] detected 2-D landmarks.

        ``mesh``: optional ``jax.sharding.Mesh`` with a 'data' axis.  The
        photometric phases (c/d) are means of per-frame render losses, so
        their frames shard over 'data' — each device renders its slice of
        the key frames / window and XLA all-reduces the shared-parameter
        gradients (the reference's sliding loop,
        face_tracker.py:377-530, is single-GPU-sequential).  Exact up to
        float reduction order; ``None`` = single-device (unchanged)."""
        import dataclasses
        self.assets = assets
        self.lms = jnp.asarray(lms, jnp.float32)
        # parameter dims are a property of the loaded 3DMM assets, not of
        # the config — override so any asset basis size works
        cfg = dataclasses.replace(
            cfg, id_dim=assets.base_id.shape[0],
            exp_dim=assets.base_exp.shape[0],
            tex_dim=assets.base_tex.shape[0])
        self.cfg = cfg
        self.cxy = (cfg.img_w / 2.0, cfg.img_h / 2.0)
        self.mesh = mesh

    def _data_sharding(self):
        """NamedSharding(P('data')) when a multi-device mesh is set."""
        if self.mesh is None or dict(self.mesh.shape).get("data", 1) <= 1:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P
        return NamedSharding(self.mesh, P("data"))

    # ------------------------------------------------------------------
    def _aux_assets(self):
        """The asset arrays as a jit-ARGUMENT pytree: ``point_num`` (a
        static shape) is blanked to None (an empty pytree node) so only the
        arrays are traced; losses restore it with ``_replace``."""
        return self.assets._replace(point_num=None)

    def _landmark_loss(self, p, lms, focal, assets: bfm.BFMAssets = None):
        if assets is None:
            assets = self.assets
        idb = jnp.broadcast_to(p["id"], (p["exp"].shape[0], p["id"].shape[1]))
        geo = bfm.get_3dlandmarks(assets, idb, p["exp"], p["euler"],
                                  p["trans"], focal, self.cxy)
        proj = bfm.forward_transform(geo, p["euler"], p["trans"], focal,
                                     self.cxy)
        return cal_lan_loss(proj[:, :, :2], lms)

    def _chunked_col_loss(self, pix, colors, imgs, assets):
        """Photometric term == ``cal_col_loss(render, imgs, hit)`` with the
        whole-batch render replaced by a ``photo_chunk``-frame
        ``lax.map`` under ``jax.checkpoint``.

        Exact: the loss is a mean of per-frame scalars, and each frame's
        term here applies the identical shade + distance ops.  Peak memory
        drops from O(B) frames of barycentric-blend intermediates (the
        backward of the B=50 vmap wants a 19 GB [3, B, 500, 500, 3]
        tensor) to O(photo_chunk); the checkpoint re-renders a chunk in
        the backward instead of storing its intermediates."""
        c = self.cfg

        def frame_term(args):
            pix_b, col_b, img_b = args
            frag = rasterize(jax.lax.stop_gradient(pix_b), assets.tris,
                             c.img_h, c.img_w, **c.raster_kwargs)
            bary = recompute_barycentrics(frag.pix_to_face, pix_b,
                                          assets.tris)
            face = jnp.maximum(frag.pix_to_face, 0)
            vals = jnp.sum(bary[..., None] * col_b[assets.tris[face]],
                           axis=2)
            hit = frag.pix_to_face >= 0
            img = jnp.where(hit[..., None], jnp.clip(vals, 0, 255), 0.0)
            m = jax.lax.stop_gradient(hit).astype(jnp.float32)
            dist = (jnp.sqrt(jnp.sum((img - img_b) ** 2, axis=2) + 1e-12)
                    * m / 255.0)
            return jnp.sum(dist) / jnp.maximum(jnp.sum(m), 1e-6)

        if self._data_sharding() is None:
            terms = jax.lax.map(jax.checkpoint(frame_term),
                                (pix, colors, imgs),
                                batch_size=min(c.photo_chunk, pix.shape[0]))
            return jnp.mean(terms)

        # frame DP over the mesh (VERDICT r3 #5): each device lax.maps its
        # OWN slice of the frames (per-device peak memory still
        # O(photo_chunk)) and the weighted term sum all-reduces.  Frames
        # pad to a multiple of the axis by repetition with weight 0 —
        # repeated frames render valid geometry (no NaNs) and contribute
        # exactly zero to the sum AND to the gradients, so the sharded
        # loss == the sequential loss up to float reduction order.
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        ndata = dict(self.mesh.shape)["data"]
        b = pix.shape[0]
        pad = (-b) % ndata
        w = jnp.concatenate([jnp.ones((b,), jnp.float32),
                             jnp.zeros((pad,), jnp.float32)])
        if pad:
            # pad may exceed b (e.g. 3 frames on 8 devices) — tile modularly
            pad_idx = jnp.arange(pad) % b
            rep = lambda t: jnp.concatenate([t, t[pad_idx]], axis=0)
            pix, colors, imgs = rep(pix), rep(colors), rep(imgs)

        def local_sum(pix_l, col_l, img_l, w_l):
            terms = jax.lax.map(jax.checkpoint(frame_term),
                                (pix_l, col_l, img_l),
                                batch_size=min(c.photo_chunk,
                                               pix_l.shape[0]))
            return jax.lax.psum(jnp.sum(terms * w_l), "data")

        total = shard_map(local_sum, mesh=self.mesh,
                          in_specs=(P("data"), P("data"), P("data"),
                                    P("data")),
                          out_specs=P())(pix, colors, imgs, w)
        return total / b

    def find_focal(self, step: int = 100, lo: int = 600, hi: int = 1500,
                   frame_stride: int = 40) -> float:
        """Grid-search the focal length (face_tracker.py:213-281)."""
        c = self.cfg
        sel = np.arange(0, self.lms.shape[0], frame_stride)
        lms = self.lms[sel]
        n = len(sel)
        a_n, pn = self._aux_assets(), self.assets.point_num

        def loss_pose(q, a_, lms_, f_, id0, exp0):
            a = a_._replace(point_num=pn)
            return self._landmark_loss({"id": id0, "exp": exp0, **q},
                                       lms_, f_, assets=a)

        # + id/exp with reg, lr ×0.2 at 1500
        sched = optax.piecewise_constant_schedule(0.1, {1500: 0.2})

        def loss_all(q, a_, lms_, f_):
            return (self._landmark_loss(q, lms_, f_,
                                        assets=a_._replace(point_num=pn))
                    + 0.5 * jnp.mean(q["id"] ** 2)
                    + 0.4 * jnp.mean(q["exp"] ** 2))

        # the focal is a TRACED aux input, so ONE compile of each loop
        # serves the whole candidate grid
        run_pose = make_adam_runner(loss_pose, ("euler", "trans"),
                                    {"euler": 0.1, "trans": 0.1},
                                    c.iters_focal_pose,
                                    segment=c.lms_segment)
        keys = ("id", "exp", "euler", "trans")
        run_all = make_adam_runner(loss_all, keys, {k: sched for k in keys},
                                   c.iters_focal_idexp,
                                   segment=c.lms_segment)

        best_focal, best_loss = hi, np.inf
        for focal in range(lo, hi, step):
            f = jnp.float32(focal)
            p = {"id": jnp.zeros((1, c.id_dim)),
                 "exp": jnp.zeros((n, c.exp_dim)),
                 "euler": jnp.zeros((n, 3)),
                 "trans": jnp.zeros((n, 3)).at[:, 2].add(-7.0)}
            pose = run_pose({k: p[k] for k in ("euler", "trans")},
                            (a_n, lms, f, p["id"], p["exp"]))
            p.update(pose)
            p = run_all(p, (a_n, lms, f))
            final = float(self._landmark_loss(p, lms, float(focal)))
            if final < best_loss:
                best_loss, best_focal = final, focal
        return float(best_focal)

    # ------------------------------------------------------------------
    def fit(self, focal: float, images: Optional[np.ndarray] = None,
            progress: bool = False,
            timings: Optional[Dict[str, float]] = None
            ) -> Dict[str, np.ndarray]:
        """Phases a–d. ``images``: [N, H, W, 3] uint8/float RGB frames for
        the photometric phases (None → landmark-only fit).
        ``timings``: optional dict filled with per-phase wall-clock seconds
        (device-synced; used by tools/bench_preprocess.py)."""
        import time as _time

        def _mark(name, t0, tree):
            if timings is not None:
                np.asarray(jax.tree.leaves(tree)[0])  # device sync
                timings[name] = _time.perf_counter() - t0
                import sys
                print(f"# {name}: {timings[name]:.1f}s", file=sys.stderr,
                      flush=True)
            return _time.perf_counter()

        t0 = _time.perf_counter()
        c = self.cfg
        n = self.lms.shape[0]
        p = {"id": jnp.zeros((1, c.id_dim)),
             "exp": jnp.zeros((n, c.exp_dim)),
             "euler": jnp.zeros((n, 3)),
             "trans": jnp.zeros((n, 3)).at[:, 2].add(-7.0)}
        tex = jnp.zeros((1, c.tex_dim))
        light = jnp.zeros((n, 27))

        a_n, pn = self._aux_assets(), self.assets.point_num
        focal_j = jnp.float32(focal)

        # phase a: pose only, lr 1 → 0.1 at iter 1000 (face_tracker.py:341)
        sched_a = optax.piecewise_constant_schedule(1.0, {1000: 0.1})
        pose = {k: p[k] for k in ("euler", "trans")}

        def loss_a(q, a_, lms_, f_, id0, exp0):
            return self._landmark_loss(
                {"id": id0, "exp": exp0, **q}, lms_, f_,
                assets=a_._replace(point_num=pn))

        pose = _adam_loop(loss_a, pose, {"euler": sched_a, "trans": sched_a},
                          c.iters_pose, segment=c.lms_segment,
                          aux=(a_n, self.lms, focal_j, p["id"], p["exp"]))
        p.update(pose)
        t0 = _mark("phase_a_pose", t0, pose)

        # phase b: + id/exp + reg, lr 0.1 ×0.2 at 1000 (:349-374)
        sched_b = optax.piecewise_constant_schedule(0.1, {1000: 0.2})

        def loss_b(q, a_, lms_, f_):
            return (self._landmark_loss(q, lms_, f_,
                                        assets=a_._replace(point_num=pn))
                    + 0.5 * jnp.mean(q["id"] ** 2)
                    + 0.4 * jnp.mean(q["exp"] ** 2))

        p = _adam_loop(loss_b, p, {k: sched_b for k in p},
                       c.iters_idexp, segment=c.lms_segment,
                       aux=(a_n, self.lms, focal_j))
        t0 = _mark("phase_b_idexp", t0, p)

        if images is None:
            return self._pack(p, tex, light, focal)

        images = jnp.asarray(images, jnp.float32)

        # phase c: photometric fit on key frames (:377-436)
        bs = min(c.batch_size, n)
        sel = np.arange(0, n, max(1, n // bs))[:bs]
        sel_imgs = images[sel]
        sel_lms = self.lms[sel]

        photo = {"id": p["id"], "exp_sel": p["exp"][sel],
                 "euler_sel": p["euler"][sel], "trans_sel": p["trans"][sel],
                 "tex": tex, "light": jnp.zeros((bs, 27))}

        def pix_colors(q, assets):
            idb = jnp.broadcast_to(q["id"], (bs, c.id_dim))
            texb = jnp.broadcast_to(
                bfm.forward_tex(assets, q["tex"]), (bs, assets.point_num, 3))
            geo = bfm.forward_geo(assets, idb, q["exp_sel"])
            rott = bfm.rot_trans_pts(geo, bfm.euler2rot(q["euler_sel"]),
                                     q["trans_sel"])
            normals = bfm.vertex_normals(rott, assets.tris,
                                         assets.vert_tris)
            colors = bfm.sh_illumination(texb, normals, q["light"])
            pix = bfm.proj_pts(rott, focal, self.cxy)
            pix = pix.at[:, :, 2].multiply(-1.0)  # camera looks down -z
            return pix, colors

        def loss_c(q, a_, imgs_, lms_, step_weights):
            assets = a_._replace(point_num=pn)
            w_lan, w_id, w_exp = step_weights
            idb = jnp.broadcast_to(q["id"], (bs, c.id_dim))
            geo = bfm.get_3dlandmarks(assets, idb, q["exp_sel"],
                                      q["euler_sel"], q["trans_sel"], focal,
                                      self.cxy)
            proj = bfm.forward_transform(geo, q["euler_sel"], q["trans_sel"],
                                         focal, self.cxy)
            loss_lan = cal_lan_loss(proj[:, :, :2], lms_)
            pix, colors = pix_colors(q, assets)
            loss_col = self._chunked_col_loss(pix, colors, imgs_, assets)
            return (loss_col + loss_lan * w_lan
                    + w_id * jnp.mean(q["id"] ** 2)
                    + w_exp * jnp.mean(q["exp_sel"] ** 2))

        # two weight regimes (iter ≤/> 50) + lr ×0.2 at 5 and 55 (:425-435)
        lr_tl = optax.piecewise_constant_schedule(0.1, {5: 0.2, 55: 0.2})
        lr_if = optax.piecewise_constant_schedule(0.01, {5: 0.2, 55: 0.2})
        lrs = {"tex": lr_tl, "light": lr_tl, "id": lr_if, "exp_sel": lr_if,
               "euler_sel": lr_if, "trans_sel": lr_if}
        aux_c = (a_n, sel_imgs, sel_lms)
        n1 = min(51, c.iters_photo)
        photo = _adam_loop(loss_c, photo, lrs, n1, ((3.0, 2.0, 1.0),),
                           aux=aux_c, segment=c.photo_segment)
        if c.iters_photo > 51:
            photo = _adam_loop(loss_c, photo, lrs, c.iters_photo - 51,
                               ((0.05, 1.0, 0.8),), aux=aux_c,
                               segment=c.photo_segment)

        t0 = _mark("phase_c_photometric", t0, photo)
        p["id"] = photo["id"]
        tex = photo["tex"]
        p["exp"] = p["exp"].at[sel].set(photo["exp_sel"])
        p["euler"] = p["euler"].at[sel].set(photo["euler_sel"])
        p["trans"] = p["trans"].at[sel].set(photo["trans_sel"])
        light = jnp.broadcast_to(jnp.mean(photo["light"], 0), (n, 27))

        # phase d: sliding-window refinement with temporal Laplacian (:441-530)
        p, light = self._phase_d(p, tex, light, images, focal)
        _mark("phase_d_window", t0, p)
        return self._pack(p, tex, light, focal)

    def _phase_d(self, p, tex, light, images, focal):
        c = self.cfg
        n = self.lms.shape[0]
        bs = min(c.batch_size, n)
        pre = 5
        rigid = self.assets.keyinds  # proxy for rigid_ids in synthetic assets
        if hasattr(self.assets, "rigid_ids"):
            rigid = self.assets.rigid_ids

        exp, euler, trans = p["exp"], p["euler"], p["trans"]
        light = jnp.asarray(light)
        id_para = p["id"]
        texv = bfm.forward_tex(self.assets, tex)
        a_n, pn = self._aux_assets(), self.assets.point_num

        def loss_d(q, a_, imgs_, lms_, id_, texv_, pre_exp, pre_euler,
                   pre_trans, weights):
            assets = a_._replace(point_num=pn)
            idb = jnp.broadcast_to(id_, (bs, c.id_dim))
            texb = jnp.broadcast_to(texv_, (bs, pn, 3))
            w_lan, = weights
            geo_l = bfm.get_3dlandmarks(assets, idb, q["exp"],
                                        q["euler"], q["trans"], focal,
                                        self.cxy)
            proj = bfm.forward_transform(geo_l, q["euler"], q["trans"],
                                         focal, self.cxy)
            loss_lan = cal_lan_loss(proj[:, :, :2], lms_)
            loss_regexp = jnp.mean(q["exp"] ** 2)

            geo = bfm.forward_geo(assets, idb, q["exp"])
            rott = bfm.rot_trans_pts(geo, bfm.euler2rot(q["euler"]),
                                     q["trans"])
            normals = bfm.vertex_normals(rott, assets.tris,
                                         assets.vert_tris)
            colors = bfm.sh_illumination(texb, normals, q["light"])
            pix = bfm.proj_pts(rott, focal, self.cxy)
            pix = pix.at[:, :, 2].multiply(-1.0)
            loss_col = self._chunked_col_loss(pix, colors, imgs_, assets)

            # window 0 passes length-0 pre arrays; later windows length-5 —
            # the runner retraces once per distinct length, not per window
            all_exp = jnp.concatenate([pre_exp, q["exp"]])
            all_euler = jnp.concatenate([pre_euler, q["euler"]])
            all_trans = jnp.concatenate([pre_trans, q["trans"]])
            nb = all_exp.shape[0]
            geo_r = bfm.forward_geo_sub(
                assets, jnp.broadcast_to(id_, (nb, c.id_dim)),
                all_exp, rigid)
            rott_r = bfm.rot_trans_pts(
                geo_r, bfm.euler2rot(all_euler), all_trans)
            loss_lap = cal_lap_loss(
                rott_r.reshape(nb, -1).T)  # [3V', T]

            return (0.5 * loss_col + w_lan * loss_lan
                    + 1e5 * loss_lap + loss_regexp)

        # runners hoisted out of the window loop: every window re-enters the
        # same executables (the reference recompiles nothing because it is
        # eager; we compile ≤2× per weight regime for ANY number of windows)
        keys = ("exp", "euler", "trans", "light")
        lrs = {k: 0.005 for k in keys}
        n1 = min(31, c.iters_window)
        run1 = make_adam_runner(loss_d, keys, lrs, n1, ((8.0,),),
                                segment=c.photo_segment)
        run2 = (make_adam_runner(loss_d, keys, lrs, c.iters_window - 31,
                                 ((1.5,),), segment=c.photo_segment)
                if c.iters_window > 31 else None)

        for i in range(int((n - 1) / bs + 1)):
            start = n - bs if (i + 1) * bs > n else i * bs
            sel = np.arange(start, start + bs)
            sel_imgs = images[sel]
            sel_lms = self.lms[sel]
            pre_ids = np.arange(max(0, start - pre), start if i > 0 else 0)

            q = {"exp": exp[sel], "euler": euler[sel], "trans": trans[sel],
                 "light": light[sel]}
            aux = (a_n, sel_imgs, sel_lms, id_para, texv,
                   exp[pre_ids], euler[pre_ids], trans[pre_ids])
            q = run1(q, aux)
            if run2 is not None:
                q = run2(q, aux)

            exp = exp.at[sel].set(q["exp"])
            euler = euler.at[sel].set(q["euler"])
            trans = trans.at[sel].set(q["trans"])
            light = light.at[sel].set(q["light"])

        p = dict(p, exp=exp, euler=euler, trans=trans)
        return p, light

    @staticmethod
    def _pack(p, tex, light, focal) -> Dict[str, np.ndarray]:
        """track_params.pt schema (face_tracker.py:528-531 + light)."""
        return {"id": np.asarray(p["id"]), "exp": np.asarray(p["exp"]),
                "euler": np.asarray(p["euler"]),
                "trans": np.asarray(p["trans"]),
                "focal": np.float32(focal), "tex": np.asarray(tex),
                "light": np.asarray(light)}
