#!/usr/bin/env python
"""Training-throughput benchmark (informational; bench.py is the driver's
headline inference metric).

Measures the full jitted train step at May geometry (500² face, 120×80 lip,
all stage-1 losses) on the current backend, fp32 vs mixed precision, with
the windowed-gradient composite path.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def batch_scaling():
    """Diagnose train-step batch amortization (VERDICT r2 weak #5 / next #4).

    Measures, at May geometry in bf16:
      - full step ms/frame at batch 1/2/4/8;
      - the isolated U-Net forward+backward ms/frame at the same batches;
      - the isolated lip-MLP(+ensemble) forward+backward ms/frame;
      - a step with the post-fusion+U-Net path ablated (lip losses only).

    If the U-Net fwd+bwd is batch-insensitive per frame (already saturating
    the chip at batch 1 — 500² activations give ~250k-way parallelism),
    weak amortization of the full step is the roofline, not a bug.
    """
    import jax
    import jax.numpy as jnp

    from speech2lip_tpu.core.config import default_config
    from speech2lip_tpu.data.synthetic import synthetic_batch
    from speech2lip_tpu.data.windows import compute_warp_window
    from speech2lip_tpu.models import lpips as lpips_mod
    from speech2lip_tpu.models import talking_face as tfm
    from speech2lip_tpu.models import unet_light
    from speech2lip_tpu.train.train_step import (StepStatics, TrainState,
                                                 make_optimizer,
                                                 make_train_step,
                                                 render_lip_ensemble)

    face, lip_h, lip_w = 500, 80, 120
    cfg = default_config()
    cfg["model"]["canonical_depth_height"] = face
    cfg["model"]["canonical_depth_width"] = face
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    params = tfm.init(keys[0], cfg)
    unet_p, unet_s = unet_light.init(keys[1])
    frozen = {"lpips": lpips_mod.init(keys[2])}
    opt = make_optimizer(cfg)

    def bench(fn, *args, iters=10):
        out = fn(*args)
        jax.tree.leaves(out)[0].block_until_ready()
        float(jnp.sum(jax.tree.leaves(out)[0]))  # host readback sync
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        return (time.perf_counter() - t0) / iters

    cast = lambda t: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)

    for b in (1, 2, 4, 8):
        raw, geo = synthetic_batch(b, face=face, lip_h=lip_h, lip_w=lip_w)
        box = tfm.expanded_lip_box(lip_h, lip_w, geo["lip_x"], geo["lip_y"])
        window = compute_warp_window([raw["coord"][i] for i in range(b)],
                                     box, face, face, margin=16)
        batch = jax.tree.map(jnp.asarray, raw)
        st = StepStatics(
            lip_h=lip_h, lip_w=lip_w, lip_x=geo["lip_x"], lip_y=geo["lip_y"],
            face_h=face, face_w=face, focal=1200.0,
            face_bbox=(50, 50, 450, 450), window=window,
            compute_dtype="bfloat16")
        trainable = {"model": params, "unet": unet_p}
        state0 = TrainState(params, unet_p, unet_s, opt.init(trainable),
                            jnp.int32(0))

        # full step
        step = make_train_step(opt, st, frozen, donate=False)
        dt_full = bench(lambda: step(state0, batch, jax.random.PRNGKey(1)))

        # lip-losses-only step (post-fusion + U-Net + depth ablated)
        st_lip = StepStatics(
            lip_h=lip_h, lip_w=lip_w, lip_x=geo["lip_x"], lip_y=geo["lip_y"],
            face_h=face, face_w=face, focal=1200.0,
            face_bbox=(50, 50, 450, 450), window=window,
            compute_dtype="bfloat16", use_canonical_depth_loss=False,
            use_perceptual=False)

        def lip_only_loss(p, a, rgb, key):
            out = render_lip_ensemble(p, a, batch["index"].astype(
                jnp.float32), key, st_lip)
            return jnp.mean((out - rgb) ** 2)

        lip_grad = jax.jit(jax.grad(lip_only_loss))
        p_c = cast(params)
        dt_lip = bench(lambda: lip_grad(p_c,
                                        batch["audio"].astype(jnp.bfloat16),
                                        batch["rgb"].astype(jnp.bfloat16),
                                        jax.random.PRNGKey(1)))

        # isolated U-Net fwd+bwd at 500²
        x = jnp.asarray(raw["rgb_face_ori"], jnp.bfloat16)

        def unet_loss(up, xx):
            y, _ = unet_light.apply(up, cast(unet_s), xx, train=True)
            return jnp.mean((y - xx) ** 2)

        unet_grad = jax.jit(jax.grad(unet_loss))
        up_c = cast(unet_p)
        dt_unet = bench(lambda: unet_grad(up_c, x))

        print(f"batch {b}: full {dt_full * 1e3 / b:6.1f} ms/frame "
              f"(step {dt_full * 1e3:6.1f}) | unet f+b "
              f"{dt_unet * 1e3 / b:6.1f} ms/frame | lip-mlp f+b "
              f"{dt_lip * 1e3 / b:6.1f} ms/frame")


def ablate():
    """Per-loss-term step-time ablation at batch 1 and 8 (bf16, May
    geometry): which term is eating the batch amortization?"""
    import jax
    import jax.numpy as jnp

    from speech2lip_tpu.core.config import default_config
    from speech2lip_tpu.data.synthetic import synthetic_batch
    from speech2lip_tpu.data.windows import compute_warp_window
    from speech2lip_tpu.models import lpips as lpips_mod
    from speech2lip_tpu.models import talking_face as tfm
    from speech2lip_tpu.models import unet_light
    from speech2lip_tpu.train.train_step import (StepStatics, TrainState,
                                                 make_optimizer,
                                                 make_train_step)

    face, lip_h, lip_w = 500, 80, 120
    cfg = default_config()
    cfg["model"]["canonical_depth_height"] = face
    cfg["model"]["canonical_depth_width"] = face
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    params = tfm.init(keys[0], cfg)
    unet_p, unet_s = unet_light.init(keys[1])
    frozen = {"lpips": lpips_mod.init(keys[2])}
    opt = make_optimizer(cfg)

    def bench(step, state0, batch, iters=10):
        s, m = step(state0, batch, jax.random.PRNGKey(1))
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(iters):
            s, m = step(s, batch, jax.random.fold_in(jax.random.PRNGKey(2),
                                                     i))
        float(m["loss"])
        return (time.perf_counter() - t0) / iters

    variants = [
        ("full", {}),
        ("full+hostwarp", {}),    # blackaug statics precomputed on host
        ("full+hw+dcrop", {"depth_loss_box": "auto"}),  # + depth-loss crop
        ("full+hw+pallas", {"pallas_gather": True}),  # hat_sample gathers
        # + canonical-depth POINTS path (frozen['depth_pts']): sampling
        # only the loss mask's support.  The synthetic batch's border-ring
        # mask is unrealistically small, so the bundle below uses a
        # disk-ring mask with May-like support (~30% of the frame) — the
        # COST depends only on S, not the mask values.
        ("full+hw+pts", {"pallas_gather": True, "_depth_pts": True}),
        ("no-blackaug", {"use_blackaug": False}),
        ("no-depthloss", {"use_canonical_depth_loss": False}),
        ("no-perceptual", {"use_perceptual": False}),
        ("no-ensemble", {"ensemble": False}),
        ("photo-only", {"use_blackaug": False,
                        "use_canonical_depth_loss": False,
                        "use_perceptual": False}),
    ]
    from speech2lip_tpu.ops.grid_sample import grid_sample_np
    for b in (1, 8):
        raw, geo = synthetic_batch(b, face=face, lip_h=lip_h, lip_w=lip_w)
        box = tfm.expanded_lip_box(lip_h, lip_w, geo["lip_x"], geo["lip_y"])
        window = compute_warp_window([raw["coord"][i] for i in range(b)],
                                     box, face, face, margin=16)
        fz, coord = raw["rgb_face_zero"], raw["coord"]
        raw_hw = dict(raw,
                      warped_base=grid_sample_np(fz, coord),
                      blackaug_face_mask=(grid_sample_np(
                          (fz > 0).astype(fz.dtype), coord) == 1.0
                      ).astype(fz.dtype))
        batch_hw = jax.tree.map(jnp.asarray, raw_hw)
        batch = jax.tree.map(jnp.asarray, raw)
        import numpy as np
        lm = (np.asarray(raw["mask_head_canonical"])
              * (1.0 - np.asarray(raw["mask_face_canonical"])))
        sup = lm.max(axis=(0, -1)) > 0
        ys, xs = np.nonzero(sup)
        dbox = (int(xs.min()), int(xs.max()) + 1,
                int(ys.min()), int(ys.max()) + 1) if ys.size else None
        if dbox is not None and (dbox[1] - dbox[0]) * (dbox[3] - dbox[2]) > 16384:
            # same gate as trainer._depth_loss_box: the one-hot route's
            # [B, P, W·C] intermediate OOMs at near-full-frame P (batch 8)
            print(f"# depth-loss crop {dbox} too large for the MXU route "
                  "- variant skipped", flush=True)
            dbox = None
        elif dbox is not None:
            print(f"# depth-loss crop: {dbox} "
                  f"({dbox[1]-dbox[0]}x{dbox[3]-dbox[2]} of {face}²)",
                  flush=True)
        yy, xx = np.mgrid[0:face, 0:face]
        r2 = (yy - face // 2) ** 2 + (xx - face // 2) ** 2
        ring = (r2 < int(face * 0.46) ** 2) & (r2 > int(face * 0.34) ** 2)
        ys_p, xs_p = np.nonzero(ring)
        pts_bundle = {
            "xs": jnp.asarray(xs_p, jnp.int32),
            "ys": jnp.asarray(ys_p, jnp.int32),
            "w": jnp.ones((ys_p.size, 3), jnp.float32),
            "rgb_zero_pts": jnp.asarray(
                np.asarray(raw["rgb_face_zero"][0])[ys_p, xs_p],
                jnp.float32)}
        print(f"# depth-pts bundle: S={ys_p.size} "
              f"({100.0 * ys_p.size / face ** 2:.1f}% of {face}²)",
              flush=True)
        trainable = {"model": params, "unet": unet_p}
        state0 = TrainState(params, unet_p, unet_s, opt.init(trainable),
                            jnp.int32(0))
        for name, over in variants:
            over = dict(over)
            use_pts = over.pop("_depth_pts", False)
            if over.get("depth_loss_box") == "auto":
                if dbox is None:
                    continue
                over["depth_loss_box"] = dbox
            st = StepStatics(
                lip_h=lip_h, lip_w=lip_w, lip_x=geo["lip_x"],
                lip_y=geo["lip_y"], face_h=face, face_w=face, focal=1200.0,
                face_bbox=(50, 50, 450, 450), window=window,
                compute_dtype="bfloat16", **over)
            step = make_train_step(
                opt, st, dict(frozen, depth_pts=pts_bundle) if use_pts
                else frozen, donate=False)
            dt = bench(step, state0,
                       batch_hw if name.startswith("full+h") else batch)
            print(f"batch {b} {name:13s}: {dt * 1e3:7.1f} ms/step "
                  f"({dt * 1e3 / b:6.1f} ms/frame)", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from speech2lip_tpu.core.config import default_config
    from speech2lip_tpu.data.synthetic import synthetic_batch
    from speech2lip_tpu.data.windows import compute_warp_window
    from speech2lip_tpu.models import lpips as lpips_mod
    from speech2lip_tpu.models import syncnet as syncnet_mod
    from speech2lip_tpu.models import talking_face as tfm
    from speech2lip_tpu.models import unet_light
    from speech2lip_tpu.train.train_step import (StepStatics, TrainState,
                                                 make_optimizer,
                                                 make_train_step)

    face, lip_h, lip_w = 500, 80, 120
    cfg = default_config()
    cfg["model"]["canonical_depth_height"] = face
    cfg["model"]["canonical_depth_width"] = face
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    params = tfm.init(keys[0], cfg)
    unet_p, unet_s = unet_light.init(keys[1])
    frozen = {"lpips": lpips_mod.init(keys[2]),
              "syncnet": syncnet_mod.init(keys[3])}
    opt = make_optimizer(cfg)
    trainable = {"model": params, "unet": unet_p}

    batches = {}
    for bsz in (1, 4):
        raw, geo = synthetic_batch(bsz, face=face, lip_h=lip_h, lip_w=lip_w,
                                   with_sync=True)
        batches[bsz] = (jax.tree.map(jnp.asarray, raw), geo)
    box = tfm.expanded_lip_box(lip_h, lip_w, batches[1][1]["lip_x"],
                               batches[1][1]["lip_y"])
    grids = []
    for bsz in batches:
        raw = batches[bsz][0]
        grids += [c for c in raw["coord"]]
        grids += [w for cw in raw["coord_window"] for w in cw]
    window = compute_warp_window(grids, box, face, face, margin=16)
    state0 = TrainState(params, unet_p, unet_s, opt.init(trainable),
                        jnp.int32(0))
    stage1 = {k: v for k, v in batches[1][0].items()
              if k not in ("mel", "audio_window", "coord_window",
                           "rgb_window_neg")}

    # sync at batch 1 AND 4: the staged step re-renders T=5 window frames,
    # folded into one B*T-batched render+U-Net (train_step.py sync stage) —
    # amortization vs stage-1 shows up at both batch points
    cases = [(False, 1, stage1, "stage1 b1"),
             (True, 1, batches[1][0], "sync   b1"),
             (True, 4, batches[4][0], "sync   b4")]
    for cd in ("float32", "bfloat16"):
        for sync_on, bsz, b, tag in cases:
            geo = batches[bsz][1]
            st = StepStatics(
                lip_h=lip_h, lip_w=lip_w, lip_x=geo["lip_x"],
                lip_y=geo["lip_y"], face_h=face, face_w=face, focal=1200.0,
                face_bbox=(50, 50, 450, 450), window=window,
                sync_on=sync_on, postnet_frozen=sync_on, compute_dtype=cd)
            step = make_train_step(opt, st, frozen, donate=False)
            try:
                s, m = step(state0, b, jax.random.PRNGKey(1))
                float(m["loss"])
            except jax.errors.JaxRuntimeError as e:
                # the f32 B*T=20 sync step at 500² exceeds one chip's HBM
                # (measured 17.03G vs 15.75G, v5e) — report instead of die;
                # the production sync regime is bf16 (and the reference
                # itself syncs at batch 1)
                why = "OOM" if "memory" in str(e).lower() else "RUNTIME-ERR"
                print(f"{tag:9s} {cd:9s}: {why} ({str(e).splitlines()[0][:90]})",
                      flush=True)
                continue
            t0 = time.perf_counter()
            for i in range(5):
                s, m = step(s, b, jax.random.fold_in(jax.random.PRNGKey(2), i))
            float(m["loss"])
            dt = (time.perf_counter() - t0) / 5
            print(f"{tag:9s} {cd:9s}: {dt * 1000:7.1f} ms/step "
                  f"({dt * 1000 / bsz:7.1f} ms/frame)", flush=True)


if __name__ == "__main__":
    if "--batch-scaling" in sys.argv:
        batch_scaling()
    elif "--ablate" in sys.argv:
        ablate()
    else:
        main()
