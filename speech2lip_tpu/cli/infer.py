"""Inference CLI (reference inference.py:53-178 surface).

Usage:
    python -m speech2lip_tpu.cli.infer configs/may/may.yaml \
        [--output_dir NAME] [--model_path P | --model_iter N] \
        [--use_new_audio] [--batch N]

Renders every frame of the val split (or the audio_test clip with
--use_new_audio), writes rendering_result/<out>/postfusion/%05d.jpg in BGR
like the reference (inference.py:174-178), batched over frames.
"""

from __future__ import annotations

import argparse
import os


def main():
    from speech2lip_tpu.core.platform import apply_env_platform
    apply_env_platform()  # JAX_PLATFORMS honored despite sitecustomize
    parser = argparse.ArgumentParser(description="Render lip-synced frames.")
    parser.add_argument("config", type=str)
    parser.add_argument("--output_dir", type=str, default="test")
    parser.add_argument("--model_path", type=str, default=None)
    parser.add_argument("--model_iter", type=str, default=None)
    parser.add_argument("--use_new_audio", action="store_true")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--bf16", action="store_true",
                        help="serve in bfloat16 (enables the fully-fused "
                             "Pallas U-Net path on TPU, ~1.4x; outputs "
                             "differ from fp32 by <= the bf16 quantum). "
                             "Already the default on TPU backends.")
    parser.add_argument("--fp32", action="store_true",
                        help="force float32 serving (opts out of the TPU "
                             "bf16 default; loses the fused U-Net path)")
    parser.add_argument("--export_video", action="store_true",
                        help="also mux the frames (+ audio.wav if present) "
                             "into rendering_result/<out>/result.avi")
    parser.add_argument("--change_pose", type=float, default=None,
                        help="controllable pose: value assigned to one "
                             "canonical euler/trans component "
                             "(reference inference.py:59; see "
                             "infer/pose_edit.py)")
    parser.add_argument("--pose_edit", choices=["euler", "trans"],
                        default="euler")
    parser.add_argument("--pose_axis", type=int, default=0,
                        help="which euler/trans component to edit (0..2)")
    args = parser.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from speech2lip_tpu.core.checkpoint import CheckpointManager
    from speech2lip_tpu.core.config import load_config
    from speech2lip_tpu.data.dataset import LipDataset, stack_batch
    from speech2lip_tpu.data.windows import compute_warp_window
    from speech2lip_tpu.infer.renderer import Renderer
    from speech2lip_tpu.models import talking_face as tf
    from speech2lip_tpu.train.trainer import init_models
    from speech2lip_tpu.train.train_step import TrainState

    cfg = load_config(args.config)
    # bf16 is the measured production configuration on TPU (bench.py) —
    # make it the serving default there so the out-of-box path runs the
    # headline fused kernels; fp32 stays available via --fp32
    if args.fp32:
        cfg["model"]["compute_dtype"] = "float32"
    elif args.bf16:
        cfg["model"]["compute_dtype"] = "bfloat16"
    elif (jax.default_backend() not in ("cpu",)
          and cfg["model"].get("compute_dtype", "float32") == "float32"):
        cfg["model"]["compute_dtype"] = "bfloat16"
        print("TPU backend: serving in bfloat16 (pass --fp32 to override)")
    mode = "test" if args.use_new_audio else "val"
    ds = LipDataset(cfg["data"]["path"], mode, cfg)

    params, unet_p, unet_s, _ = init_models(cfg, ds)
    mgr = CheckpointManager(cfg["training"]["out_dir"])
    name = args.model_path or (
        f"model_{args.model_iter}.ckpt" if args.model_iter else None)
    like = TrainState(params, unet_p, unet_s, None, jnp.int32(0))
    state, scalars = mgr.restore(like, name=name)
    if not scalars:
        print("WARNING: no checkpoint found in "
              f"{cfg['training']['out_dir']} — rendering with RANDOM weights")
    else:
        print(f"loaded checkpoint at it={scalars.get('it')}")

    # compute + cache the warp window for the fast composite path
    window = cfg["data"].get("warp_window")
    if window is None and os.path.isdir(ds.coords_dir):
        box = tf.expanded_lip_box(ds.lip_h, ds.lip_w,
                                  ds.lefttop_x, ds.lefttop_y,
                                  cfg["data"].get("expand_mask_divisor", 5))
        from speech2lip_tpu.data.windows import cached_warp_window
        window = cached_warp_window(
            cfg["data"]["path"], box, ds.face_h, ds.face_w,
            ds.iter_coords)
        print(f"warp window: {window}")

    if args.change_pose is not None:
        import functools
        from speech2lip_tpu.infer.pose_edit import render_pose_edited_batch
        fn = jax.jit(functools.partial(
            render_pose_edited_batch,
            lip_x=ds.lefttop_x, lip_y=ds.lefttop_y,
            lip_h=ds.lip_h, lip_w=ds.lip_w,
            focal=float(cfg["data"]["face_img_focal"]),
            edit=args.pose_edit, axis=args.pose_axis,
            value=float(args.change_pose)))
        renderer = lambda batch, _x, _y: {"face": fn(
            state.params, state.unet_params, state.unet_state, batch)}
        print(f"pose edit: {args.pose_edit}[{args.pose_axis}] = "
              f"{args.change_pose}")
    else:
        renderer = Renderer(cfg, state.params, state.unet_params,
                            state.unet_state, window=window)

    out_dir = os.path.join("rendering_result", args.output_dir, "postfusion")
    os.makedirs(out_dir, exist_ok=True)

    n = len(ds)
    exported = [] if args.export_video else None
    for start in range(0, n, args.batch):
        idxs = list(range(start, min(start + args.batch, n)))
        batch = stack_batch([ds.load_frame(i) for i in idxs])
        batch = jax.tree.map(jnp.asarray, batch)
        out = renderer(batch, ds.lefttop_x, ds.lefttop_y)
        faces = np.asarray(out["face"])
        for j, i in enumerate(idxs):
            rgb8 = (np.clip(faces[j], 0, 1) * 255).round().astype(np.uint8)
            cv2.imwrite(os.path.join(out_dir, f"{i + 1:05d}.jpg"),
                        cv2.cvtColor(rgb8, cv2.COLOR_RGB2BGR))
            if exported is not None:
                exported.append(rgb8)
    print(f"wrote {n} frames to {out_dir}")

    if exported:
        from speech2lip_tpu.preprocess.video_io import write_avi
        audio = None
        wav_path = os.path.join(cfg["data"]["path"], "audio", "audio.wav")
        if os.path.exists(wav_path):
            from scipy.io import wavfile
            _, audio = wavfile.read(wav_path)
        vid = os.path.join(os.path.dirname(out_dir), "result.avi")
        write_avi(vid, exported, fps=cfg["data"].get("fps", 25.0),
                  audio=audio)
        print(f"wrote {vid}")


if __name__ == "__main__":
    main()
