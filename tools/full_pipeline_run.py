"""Raw-video-to-talking-head: the reference's ENTIRE workflow as one command.

The system-level chain the convergence artifact (tools/convergence_run.py)
does not cover: that run starts from an already-materialized dataset tree;
this one starts from a raw AVI with an audio track — exactly where a user
of the reference starts (reference README.md "Data Preparation" →
preprocess_may.sh STEP0–6 → train.py → inference.py) — and drives every
production CLI in order:

  1. synthesize a talking-head world: a 3DMM identity whose expression
     trajectory is a smooth function of time, an audio track whose
     amplitude envelopes follow the expression components (so the audio
     genuinely carries the mouth state), rendered with the differentiable
     rasterizer and muxed into an MJPG+PCM AVI by our own writer;
  2. `cli.preprocess extract`    — demux video → ori_images + audio.wav;
  3. `cli.preprocess crop_face`  — STEP0 fixed-window crop;
  4. `cli.preprocess landmarks`  — STEP1 through the real FAN+DSFD code
     (synthetic weights: the pretrained .pth artifacts do not exist in
     this environment, so the landmark FILES are then replaced with the
     projected ground-truth points — the reference's own accuracy rests
     on pretrained FAN the same way);
  5. `cli.preprocess track`      — find_focal grid search + 4-phase fit;
  6. warp / uv_mapping / masks / crop_lip / audio_features (DeepSpeech
     features of the demuxed wav);
  7. train stage-1 from random init on the produced tree (full loss
     pipeline, best-checkpoint selection on val PSNR);
  8. `cli.infer` renders the held-out val split from model_best.ckpt;
  9. `cli.evaluate` scores rendered frames vs ground truth.

    python tools/full_pipeline_run.py --out /tmp/pipe [--cpu] \
        [--frames 80 --crop 96 --lip-w 24 --lip-h 16 --iters 1200] \
        [--track-scale 0.25] [--json PIPELINE.json] [--psnr-bar 26]

Writes a JSON report: per-phase wall-clock, the focal recovered by the
grid search vs the true rendering focal, the val-PSNR trajectory, and the
rendered-frame metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def save_assets_reference_schema(assets, assets_dir: str) -> None:
    """Write a BFMAssets as the reference's 3DMM_info/keys_info/topology_info
    .npy schema (facemodel.py:15-49), so load_assets round-trips it."""
    import numpy as np
    os.makedirs(assets_dir, exist_ok=True)
    n3 = assets.point_num * 3
    np.save(os.path.join(assets_dir, "3DMM_info.npy"), {
        "b_shape": np.asarray(assets.base_id) * 1e5,
        "b_exp": np.asarray(assets.base_exp) * 1e5,
        "mu_shape": np.asarray(assets.mu) * 1e5,
        "mu_exp": np.zeros(n3, np.float32),
        "b_tex": np.asarray(assets.base_tex),
        "mu_tex": np.asarray(assets.mu_tex),
        "sig_shape": np.asarray(assets.sig_id),
        "sig_exp": np.asarray(assets.sig_exp),
        "sig_tex": np.asarray(assets.sig_tex),
    }, allow_pickle=True)
    np.save(os.path.join(assets_dir, "keys_info.npy"), {
        "keyinds": np.asarray(assets.keyinds),
        "left_contour": np.asarray(assets.left_contour),
        "right_contour": np.asarray(assets.right_contour),
        "rigid_ids": np.asarray(assets.keyinds[:20]),
    }, allow_pickle=True)
    np.save(os.path.join(assets_dir, "topology_info.npy"), {
        "tris": np.asarray(assets.tris),
        "vert_tris": np.asarray(assets.vert_tris),
    }, allow_pickle=True)


def make_world(out: str, args):
    """Synthesize the raw inputs: clip.avi (MJPG + PCM) + 3DMM assets +
    ground-truth landmarks in cropped-frame coordinates."""
    import jax.numpy as jnp
    import numpy as np
    from speech2lip_tpu.preprocess import face_3dmm as bfm
    from speech2lip_tpu.preprocess.video_io import write_avi

    rng = np.random.default_rng(args.seed)
    assets = bfm.synthetic_assets(n_verts=args.verts, id_dim=8, exp_dim=6,
                                  tex_dim=8, seed=args.seed)
    # stretch the blob along z: a unit sphere at z0 = -focal/(0.42·crop)
    # subtends depth/distance ≈ 1/33 — focal and depth are then nearly
    # interchangeable and find_focal's landmark grid is flat.  A real face
    # at arm's length sits near 1/10; stretching restores that, making the
    # recovered focal a meaningful check rather than a coin flip.
    if args.depth_stretch != 1.0:
        mu = np.asarray(assets.mu).reshape(-1, 3).copy()
        mu[:, 2] *= args.depth_stretch
        assets = assets._replace(mu=jnp.asarray(mu.reshape(-1)))
    assets_dir = os.path.join(out, "assets")
    save_assets_reference_schema(assets, assets_dir)

    n, fps = args.frames, 25.0
    t = np.arange(n) / fps
    # expression: smooth multi-frequency trajectory (the "speech")
    exp = np.zeros((n, 6), np.float32)
    freqs = (1.3, 0.7, 2.1)
    amps = (0.9, 0.6, 0.4)
    phases = (0.0, 1.1, 0.3)
    for k, (f, a, ph) in enumerate(zip(freqs, amps, phases)):
        exp[:, k] = a * np.sin(2 * np.pi * f * t + ph)
    # mild head motion so the tracker/warp path has real work to do
    euler = np.stack([0.05 * np.sin(2 * np.pi * 0.31 * t + p)
                      for p in (0.0, 2.0, 4.0)], axis=1).astype(np.float32)
    z0 = -args.focal_true / (0.42 * args.crop)  # face radius ≈ 0.42·crop px
    trans = np.stack([0.15 * np.sin(2 * np.pi * 0.23 * t),
                      0.12 * np.sin(2 * np.pi * 0.17 * t + 1.0),
                      z0 + args.z_motion * np.sin(2 * np.pi * 0.11 * t)],
                     axis=1).astype(np.float32)

    # audio: tones whose amplitude envelopes follow the expression comps
    sr = 16000
    ns = int(round(n / fps * sr))
    ta = np.arange(ns) / sr
    wav = np.zeros(ns, np.float64)
    for k, (f, a, ph) in enumerate(zip(freqs, amps, phases)):
        env = 0.5 + 0.45 * np.sin(2 * np.pi * f * ta + ph)
        wav += (0.28, 0.2, 0.14)[k] * env * np.sin(2 * np.pi * (220 * 2**k) * ta)
    wav_i16 = (np.clip(wav, -1, 1) * 32767).astype(np.int16)

    # render the posed, lit identity at raw size, face at frame center
    raw = args.crop + 2 * args.margin
    idp = jnp.zeros((1, 8))
    ej, tj, xj = jnp.asarray(euler), jnp.asarray(trans), jnp.asarray(exp)
    tex = jnp.broadcast_to(bfm.forward_tex(assets, jnp.asarray(
        0.5 * rng.standard_normal((1, 8)), jnp.float32)),
        (n, assets.point_num, 3))
    gamma = np.zeros((n, 27), np.float32)
    gamma[:, 0] = 0.2 * np.sin(2 * np.pi * 0.13 * t)  # slow light drift
    frames = []
    chunk = 8
    for i in range(0, n, chunk):
        sl = slice(i, min(n, i + chunk))
        geo = bfm.forward_geo(assets, jnp.broadcast_to(idp, (sl.stop - sl.start, 8)),
                              xj[sl])
        rott = bfm.rot_trans_pts(geo, bfm.euler2rot(ej[sl]), tj[sl])
        imgs, _ = bfm.render_mesh(assets, rott, tex[sl],
                                  jnp.asarray(gamma[sl]), args.focal_true,
                                  raw, raw, tile=16, max_faces_per_tile=256,
                                  chunk=4)
        frames.extend(np.asarray(imgs).astype(np.uint8))

    # guard against the silent-black-render failure mode (a missing -z
    # camera negation once produced an all-black world here, which trains
    # to a meaningless 47 dB PSNR): the synthesized video must carry signal
    fstack = np.stack(frames)
    if fstack.max() < 20 or fstack.std() < 2.0:
        raise RuntimeError(
            f"synthesized world is (near-)black: max={fstack.max()} "
            f"std={fstack.std():.2f} — rendering convention broken")

    write_avi(os.path.join(out, "clip.avi"), frames, fps=fps,
              audio=wav_i16, sample_rate=sr)

    # ground-truth 68-point landmarks, mapped raw → cropped coords
    geo_l = bfm.get_3dlandmarks(assets, jnp.broadcast_to(idp, (n, 8)), xj,
                                ej, tj, args.focal_true, (raw / 2, raw / 2))
    lms_raw = np.asarray(bfm.forward_transform(
        geo_l, ej, tj, args.focal_true, (raw / 2, raw / 2))[:, :, :2])
    off = raw // 2 - args.crop // 2
    return {"assets_dir": assets_dir, "lms_crop": lms_raw - off,
            "raw": raw, "n": n}


def synth_step1_weights(out: str):
    """FAN + DSFD checkpoints with shallow random weights (the pretrained
    artifacts are not available in this environment; STEP1's file contract
    is still exercised through the real detector/landmark code)."""
    import jax
    from speech2lip_tpu.core import checkpoint as ckpt
    from speech2lip_tpu.models import dsfd as dsfd_mod
    from speech2lip_tpu.models import fan as fan_mod
    wdir = os.path.join(out, "weights")
    os.makedirs(wdir, exist_ok=True)
    fan_p, fan_s = fan_mod.init(jax.random.PRNGKey(0), n_modules=1)
    ckpt.save(os.path.join(wdir, "fan.ckpt"), {"params": fan_p, "state": fan_s})
    dsfd_p, dsfd_s = dsfd_mod.init(jax.random.PRNGKey(1), depths=(1, 1, 1, 1))
    ckpt.save(os.path.join(wdir, "dsfd.ckpt"),
              {"params": dsfd_p, "state": dsfd_s})
    return wdir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--crop", type=int, default=96, help="STEP0 crop size")
    ap.add_argument("--margin", type=int, default=24)
    ap.add_argument("--lip-w", type=int, default=24)
    ap.add_argument("--lip-h", type=int, default=16)
    ap.add_argument("--verts", type=int, default=400)
    ap.add_argument("--depth-stretch", type=float, default=2.5,
                    help="stretch the synthetic head along z so focal is "
                         "identifiable from the landmark grid (see "
                         "make_world)")
    ap.add_argument("--z-motion", type=float, default=1.0,
                    help="amplitude of the head's z oscillation (scale "
                         "cue across frames)")
    ap.add_argument("--focal-true", type=float, default=900.0,
                    help="rendering focal; find_focal's 600–1500 grid "
                         "must straddle it")
    ap.add_argument("--track-scale", type=float, default=0.25)
    ap.add_argument("--iters", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--val-frames", type=int, default=12)
    ap.add_argument("--validate-every", type=int, default=100)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dtype", default=None,
                    help="training.compute_dtype override (e.g. bfloat16)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--devices", type=int, default=1,
                    help="virtual host-platform device count for this run "
                         "and every CLI it spawns (CPU backend only)")
    ap.add_argument("--json", default=None)
    ap.add_argument("--psnr-bar", type=float, default=None)
    args = ap.parse_args()

    # Pin the virtual device count BEFORE any jax import, replacing whatever
    # the parent exported: pytest's conftest sets
    # XLA_FLAGS=--xla_force_host_platform_device_count=8, and inheriting it
    # turns --batch 2 into a global batch of 16 against a 10-frame clip
    # (trainer.py rejects that).  Subprocess envs are built from os.environ
    # after this point, so every spawned CLI sees the same pinning.
    import re
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   os.environ.get("XLA_FLAGS", "")).strip()
    if args.devices > 1:
        flags = (flags +
                 f" --xla_force_host_platform_device_count={args.devices}"
                 ).strip()
    os.environ["XLA_FLAGS"] = flags
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.out, exist_ok=True)
    root = os.path.join(args.out, "identity")
    timings, t_all = {}, time.time()

    t0 = time.time()
    world = make_world(args.out, args)
    wdir = synth_step1_weights(args.out)
    timings["synthesize_world"] = round(time.time() - t0, 1)

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    if args.cpu:
        env["JAX_PLATFORMS"] = "cpu"

    def pre(step, *extra):
        t0 = time.time()
        subprocess.run(
            [sys.executable, "-m", "speech2lip_tpu.cli.preprocess", step,
             "--root", root, "--assets", world["assets_dir"],
             "--crop_size", str(args.crop),
             "--lip_w", str(args.lip_w), "--lip_h", str(args.lip_h),
             "--track_scale", str(args.track_scale),
             "--weights_dir", wdir, *extra],
            check=True, env=env, cwd=repo_root)
        timings[step] = round(time.time() - t0, 1)

    pre("extract", "--video", os.path.join(args.out, "clip.avi"))
    c = world["raw"] // 2
    pre("crop_face", "--raw_frames", os.path.join(root, "ori_images"),
        "--crop_center", str(c), str(c))
    pre("landmarks")

    # STEP1 produced contract-valid artifacts through the real FAN/DSFD
    # code path; replace the landmark POINTS with projected ground truth
    # (accuracy there belongs to the absent pretrained weights)
    import numpy as np
    for i in range(world["n"]):
        np.savetxt(os.path.join(root, "landmarks", f"{i + 1:05d}.lms"),
                   world["lms_crop"][i])

    pre("track")        # find_focal grid + 4-phase fit
    for step in ("warp", "uv_mapping", "masks", "crop_lip",
                 "audio_features"):
        pre(step)

    track = np.load(os.path.join(root, "track_params.pt.npz"))
    focal_found = float(track["focal"])

    # ---- train on the preprocessed tree (full stage-1 loss pipeline)
    import yaml
    from speech2lip_tpu.core.config import default_config
    ckpt_dir = os.path.join(args.out, "ckpts")
    cfg = default_config()
    cfg["data"].update({
        "path": root, "width": args.lip_w, "height": args.lip_h,
        "face_img_focal": focal_found,
        "val_split_frames": args.val_frames,
    })
    cfg["model"].update({
        "canonical_depth_height": args.crop,
        "canonical_depth_width": args.crop,
        "canonical_depth_init_path": os.path.join(
            root, "depth_face_canonical.npy"),
    })
    cfg["training"].update({
        "out_dir": ckpt_dir, "batch_size": args.batch,
        "batch_rays": 0,
        "print_every": max(1, args.iters // 20),
        "checkpoint_every": args.validate_every,
        "backup_every": 0, "visualize_every": 0,
        "validate_every": args.validate_every,
        "learning_rate": args.lr,
    })
    if args.dtype:
        cfg["training"]["compute_dtype"] = args.dtype
    cfg_path = os.path.join(args.out, "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from speech2lip_tpu.train.trainer import fit
    t0 = time.time()
    fit(cfg, max_iters=args.iters)
    timings["train"] = round(time.time() - t0, 1)

    traj = []
    with open(os.path.join(ckpt_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "val/psnr" in rec:
                traj.append({"it": rec["it"], "psnr": rec["val/psnr"]})
    best_selected = os.path.exists(os.path.join(ckpt_dir, "model_best.ckpt"))

    # ---- render the val split from the best checkpoint; score it
    t0 = time.time()
    subprocess.run(
        [sys.executable, "-m", "speech2lip_tpu.cli.infer", cfg_path,
         "--output_dir", "pipeline", "--model_path", "model_best.ckpt",
         "--batch", str(args.batch)],
        check=True, env=env, cwd=args.out)
    timings["infer"] = round(time.time() - t0, 1)

    pred_dir = os.path.join(args.out, "rendering_result", "pipeline",
                            "postfusion")
    n_train = world["n"] - args.val_frames
    ev = subprocess.run(
        [sys.executable, "-m", "speech2lip_tpu.cli.evaluate",
         "--pred", pred_dir,
         "--gt", os.path.join(root, "ori_images_face"),
         "--offset", str(n_train)],
        check=True, env=env, capture_output=True, text=True)
    metrics = json.loads(ev.stdout.strip().splitlines()[-1])

    report = {
        "pipeline": ["synthesize(avi)", "extract", "crop_face", "landmarks",
                     "track(find_focal+fit)", "warp", "uv_mapping", "masks",
                     "crop_lip", "audio_features", "train", "infer",
                     "evaluate"],
        "geometry": {"frames": world["n"], "raw": world["raw"],
                     "crop": args.crop, "lip": [args.lip_h, args.lip_w]},
        "iters": args.iters,
        "compute_dtype": args.dtype or "float32",
        "phase_seconds": timings,
        "total_seconds": round(time.time() - t_all, 1),
        "focal_true": args.focal_true,
        "focal_found": focal_found,
        "val_psnr_trajectory": traj,
        "best_checkpoint_selected": best_selected,
        "rendered_val_metrics": metrics,
        "backend": os.environ.get("JAX_PLATFORMS", "default"),
    }
    print(json.dumps(report, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)

    if args.psnr_bar is not None:
        ok = metrics["psnr"] >= args.psnr_bar and best_selected
        print(f"PSNR bar {args.psnr_bar}: "
              f"{'PASS' if ok else 'FAIL'} (rendered {metrics['psnr']:.2f})")
        sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
