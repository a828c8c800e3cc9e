"""Preprocessing CLI: raw video frames → training artifact tree.

Equivalent of the reference's preprocess driver (reference
preprocess/preprocess_may.sh STEP0–STEP6 + audio; call stack SURVEY.md §3.3)
as one entry point with per-step subcommands:

    python -m speech2lip_tpu.cli.preprocess <step> --root DIR [options]

steps: crop_face, landmarks, track (find_focal + 4-phase fit), warp,
uv_mapping, masks, crop_lip, audio_features, all.

3DMM assets (3DMM_info.npy / keys_info.npy / topology_info.npy) and
pretrained weights (FAN, BiSeNet, DeepSpeech — converted via
tools/convert_weights.py) are user-supplied, as in the reference.
"""

from __future__ import annotations

import argparse
import os


def _imwrite(path, img_float_rgb):
    import cv2
    import numpy as np
    bgr = cv2.cvtColor(
        np.clip(img_float_rgb, 0, 255).astype("uint8") if img_float_rgb.max() > 1.5
        else (np.clip(img_float_rgb, 0, 1) * 255).astype("uint8"),
        cv2.COLOR_RGB2BGR)
    cv2.imwrite(path, bgr)


def _read_frames(frames_dir):
    import cv2
    import numpy as np
    files = sorted(f for f in os.listdir(frames_dir) if f.endswith(".jpg"))
    imgs = [cv2.cvtColor(cv2.imread(os.path.join(frames_dir, f)),
                         cv2.COLOR_BGR2RGB).astype(np.float32)
            for f in files]
    return np.stack(imgs), files


def main():
    from speech2lip_tpu.core.platform import apply_env_platform
    apply_env_platform()  # JAX_PLATFORMS honored despite sitecustomize
    p = argparse.ArgumentParser(description="Speech2Lip preprocessing")
    p.add_argument("step", choices=["extract", "crop_face", "landmarks",
                                    "track", "warp", "uv_mapping", "masks",
                                    "crop_lip", "audio_features", "all"])
    p.add_argument("--root", required=True, help="identity artifact tree")
    p.add_argument("--video", help="source video file (extract)")
    p.add_argument("--raw_frames", help="raw video frames dir (crop_face)")
    p.add_argument("--crop_center", type=int, nargs=2, default=[930, 275])
    p.add_argument("--crop_size", type=int, default=500)
    p.add_argument("--assets", help="3DMM asset dir")
    p.add_argument("--weights_dir", default="models",
                   help="dir with fan.ckpt / bisenet.ckpt / deepspeech.ckpt")
    p.add_argument("--focal", type=float, default=None,
                   help="skip find_focal with a known focal")
    p.add_argument("--lip_w", type=int, default=120)
    p.add_argument("--lip_h", type=int, default=80)
    p.add_argument("--center_y_ratio", type=float, default=1.02)
    p.add_argument("--canonical_idx", type=int, default=0)
    p.add_argument("--fps", type=float, default=25.0)
    p.add_argument("--track_scale", type=float, default=1.0,
                   help="scale factor on tracker iteration budgets")
    args = p.parse_args()

    import numpy as np
    from speech2lip_tpu.core import checkpoint as ckpt

    root = args.root
    steps = ([args.step] if args.step != "all" else
             ["landmarks", "track", "warp", "uv_mapping", "masks",
              "crop_lip", "audio_features"])

    if args.step == "extract":
        # video → ori_images/%05d.jpg + audio/audio.wav (reference STEP0
        # input + extract_wav.py; ffmpeg when present, built-in fallback)
        from speech2lip_tpu.preprocess.video_io import (extract_frames,
                                                        extract_wav)
        if not args.video:
            raise SystemExit("extract requires --video")
        os.makedirs(os.path.join(root, "audio"), exist_ok=True)
        n, fps = extract_frames(args.video, os.path.join(root, "ori_images"))
        try:
            extract_wav(args.video, os.path.join(root, "audio", "audio.wav"))
            audio_msg = "+ audio/audio.wav"
        except ValueError as e:
            audio_msg = f"(no audio extracted: {e})"
        print(f"extracted {n} frames @ {fps:g} fps {audio_msg}")
        return

    if args.step == "crop_face":
        from speech2lip_tpu.preprocess.steps import crop_face
        frames, files = _read_frames(args.raw_frames)
        out = os.path.join(root, "ori_images_face")
        os.makedirs(out, exist_ok=True)
        for img, f in zip(frames, files):
            _imwrite(os.path.join(out, f),
                     crop_face(img, tuple(args.crop_center), args.crop_size))
        print(f"cropped {len(files)} frames -> {out}")
        return

    if "landmarks" in steps:
        from speech2lip_tpu.preprocess.landmarks import run_step1
        fan_tree, _ = ckpt.load_nested(os.path.join(args.weights_dir, "fan.ckpt"))
        raise_if_flat(fan_tree, "fan")
        bis_params = bis_state = None
        bis_path = os.path.join(args.weights_dir, "bisenet.ckpt")
        if os.path.exists(bis_path):
            bis_tree, _ = ckpt.load_nested(bis_path)
            bis_params, bis_state = bis_tree["params"], bis_tree["state"]
        # face detector preference: DSFD (the reference's own detector,
        # detect_landmarks.py:38-40) > S3FD > BiSeNet parsing bbox > frame
        dsfd_tree = s3fd_params = None
        dsfd_path = os.path.join(args.weights_dir, "dsfd.ckpt")
        if os.path.exists(dsfd_path):
            tree, _ = ckpt.load_nested(dsfd_path)
            dsfd_tree = (tree["params"], tree["state"])
        s3fd_path = os.path.join(args.weights_dir, "s3fd.ckpt")
        if dsfd_tree is None and os.path.exists(s3fd_path):
            s3fd_params, _ = ckpt.load_nested(s3fd_path)
        run_step1(os.path.join(root, "ori_images_face"),
                  os.path.join(root, "landmarks"),
                  os.path.join(root, "face_bbox_dict.npy"),
                  fan_tree["params"], fan_tree["state"],
                  bis_params, bis_state, s3fd_params=s3fd_params,
                  dsfd=dsfd_tree)
        print("landmarks written"
              + (" (DSFD bboxes)" if dsfd_tree is not None else
                 " (S3FD bboxes)" if s3fd_params is not None else ""))

    # steps below need the tracked params / assets — load lazily per step
    from speech2lip_tpu.preprocess import face_3dmm as bfm
    from speech2lip_tpu.preprocess import steps as S
    from speech2lip_tpu.preprocess.tracker import FaceTracker, TrackerConfig

    frames = files = None
    if any(s in steps for s in ("track", "warp")):
        frames, files = _read_frames(os.path.join(root, "ori_images_face"))
    h = w = args.crop_size

    if "track" in steps:
        assets = bfm.load_assets(args.assets)
        lms = np.stack([np.loadtxt(os.path.join(root, "landmarks",
                                                f.replace(".jpg", ".lms")))
                        for f in files]).astype(np.float32)[:, :, :2]
        ts = args.track_scale
        cfg = TrackerConfig(
            img_h=h, img_w=w,
            iters_focal_pose=max(1, int(2000 * ts)),
            iters_focal_idexp=max(1, int(2500 * ts)),
            iters_pose=max(1, int(1500 * ts)),
            iters_idexp=max(1, int(2000 * ts)),
            iters_photo=max(1, int(71 * ts)),
            iters_window=max(1, int(50 * ts)))
        # all local devices on the 'data' axis: the photometric phases
        # shard their frames across the mesh (no-op on one device)
        import jax
        from speech2lip_tpu.parallel.mesh import make_mesh
        mesh = make_mesh() if len(jax.devices()) > 1 else None
        tr = FaceTracker(assets, lms, cfg, mesh=mesh)
        focal = args.focal or tr.find_focal()
        track = tr.fit(float(focal), images=frames)
        np.savez(os.path.join(root, "track_params.pt.npz"), **track)
        print("tracked; focal =", focal)

    def load_track():
        from speech2lip_tpu.data.dataset import _load_track_params
        return _load_track_params(os.path.join(root, "track_params.pt"))

    if "warp" in steps:
        assets = bfm.load_assets(args.assets)
        track = load_track()
        warped = S.warp_images(track, assets, frames, args.canonical_idx, h, w)
        out = os.path.join(root, "warp_images")
        os.makedirs(out, exist_ok=True)
        for img, f in zip(warped, files):
            _imwrite(os.path.join(out, f), img)
        print(f"warped {len(files)} frames")

    if "uv_mapping" in steps:
        assets = bfm.load_assets(args.assets)
        track = load_track()
        coords = S.compute_uv_mapping(track, assets, args.canonical_idx, h, w)
        out = os.path.join(root, "coords")
        os.makedirs(out, exist_ok=True)
        names = sorted(f for f in os.listdir(
            os.path.join(root, "ori_images_face")) if f.endswith(".jpg"))
        for grid, f in zip(coords, names):
            np.save(os.path.join(out, f.replace(".jpg", ".npy")), grid)
        print(f"saved {len(coords)} coord grids")

    if "masks" in steps:
        import cv2
        import jax.numpy as jnp
        assets = bfm.load_assets(args.assets)
        track = load_track()
        parsing = None
        bis_path = os.path.join(args.weights_dir, "bisenet.ckpt")
        if os.path.exists(bis_path):
            from speech2lip_tpu.models import bisenet
            tree, _ = ckpt.load_nested(bis_path)
            can = _read_frames(os.path.join(root, "ori_images_face"))[0][
                args.canonical_idx] / 255.0
            classes = np.asarray(bisenet.parse_face(
                tree["params"], tree["state"], jnp.asarray(can)))
            classes = cv2.resize(classes.astype(np.uint8), (w, h),
                                 interpolation=cv2.INTER_NEAREST)
            # color-code like the reference parsing map: head classes red
            parsing = np.zeros((h, w, 3), np.uint8)
            parsing[np.isin(classes, list(range(1, 16)))] = (255, 0, 0)
            cv2.imwrite(os.path.join(root, "canonical_face_parsing.jpg"),
                        parsing[..., ::-1])
        depth, face_mask, head_mask = S.canonical_masks(
            track, assets, args.canonical_idx, h, w, parsing_map=parsing)
        np.save(os.path.join(root, "depth_face_canonical.npy"), depth)
        cv2.imwrite(os.path.join(root, "canonical_face_mask.jpg"),
                    face_mask.astype(np.uint8) * 255)
        if head_mask is None:
            # no parsing weights: fall back to the mesh face mask so the
            # dataset contract stays complete (BiSeNet refines this)
            print("WARNING: no bisenet.ckpt; head mask = face mask")
            head_mask = face_mask
        cv2.imwrite(os.path.join(root, "canonical_head_mask.jpg"),
                    head_mask.astype(np.uint8) * 255)
        print("canonical masks + depth written")

    if "crop_lip" in steps:
        import cv2
        warped, names = _read_frames(os.path.join(root, "warp_images"))
        lms = np.loadtxt(os.path.join(
            root, "landmarks",
            "{:05d}.lms".format(args.canonical_idx + 1))).astype(np.float32)
        crops, lip_mask, (x, y) = S.crop_lip(
            warped, lms, args.lip_w, args.lip_h, args.center_y_ratio)
        out = os.path.join(root, "images")
        os.makedirs(out, exist_ok=True)
        for img, f in zip(crops, names):
            _imwrite(os.path.join(out, f), img)
        cv2.imwrite(os.path.join(root, "canonical_lip_mask.jpg"), lip_mask)
        print(f"lip crops at ({x}, {y})")

    if "audio_features" in steps:
        from speech2lip_tpu.models import deepspeech
        from speech2lip_tpu.ops.audio_dsp import load_wav
        from speech2lip_tpu.preprocess.audio_features import (
            wav_to_deepspeech_windows)
        ds_path = os.path.join(args.weights_dir, "deepspeech.ckpt")
        if os.path.exists(ds_path):
            ds_params, _ = ckpt.load_nested(ds_path)
        else:
            import jax
            print("WARNING: no deepspeech.ckpt; using random weights")
            ds_params = deepspeech.init(jax.random.PRNGKey(0))
        wav = load_wav(os.path.join(root, "audio", "audio.wav"))
        windows = wav_to_deepspeech_windows(wav, 16000, ds_params)
        np.save(os.path.join(root, "audio", "audio.npy"),
                windows.astype(np.float32))
        print(f"audio features: {windows.shape}")


def raise_if_flat(tree, name):
    if not isinstance(tree, dict) or "params" not in tree:
        raise SystemExit(
            f"{name}.ckpt must hold {{'params', 'state'}} (convert via "
            "tools/convert_weights.py)")


if __name__ == "__main__":
    main()
