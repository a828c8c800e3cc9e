"""Multi-identity serving daemon (filesystem request queue).

The production serving surface the reference lacks (its only inference
entry is the offline eval CLI, reference inference.py): load N trained
identities, hold one compiled render program per lip-offset group
(MultiSpeakerServer), and stream new-audio requests through it.

Usage:
    python -m speech2lip_tpu.cli.serve cfg_id0.yaml [cfg_id1.yaml ...] \
        --queue QUEUE_DIR --out OUT_DIR [--batch 32] [--poll 0.5] \
        [--once] [--deepspeech deepspeech.ckpt]

Request protocol (one file per request dropped into QUEUE_DIR):
    <identity_index>__<request_id>.npy   DeepSpeech windows [N, 16, 29]
    <identity_index>__<request_id>.wav   raw speech (requires --deepspeech,
                                         or mel mode via use_audio_mel)
Atomic handoff: clients SHOULD write to a temporary name (no ``__`` or a
different extension) and ``os.rename`` into the queue — renames within a
directory are atomic, so the daemon never sees a half-written file.  As a
second line of defense the daemon skips files modified within the last
``--grace`` seconds and retries a failed parse once on the next poll
before giving up (so a slow non-atomic writer loses nothing).

Responses: frames at OUT_DIR/<request_id>/%05d.jpg (BGR, like the
reference's writer) and OUT_DIR/<request_id>.done written last; requests
that fail twice are removed and leave <request_id>.err with the message.
--once drains the queue and exits (used by tests); otherwise the daemon
polls.
"""

from __future__ import annotations

import argparse
import os
import time


def _load_identity(cfg_path):
    import jax.numpy as jnp
    from speech2lip_tpu.core.checkpoint import CheckpointManager
    from speech2lip_tpu.core.config import load_config
    from speech2lip_tpu.data.dataset import LipDataset
    from speech2lip_tpu.train.trainer import init_models
    from speech2lip_tpu.train.train_step import TrainState

    cfg = load_config(cfg_path)
    root = cfg["data"]["path"]
    mode = "test" if os.path.isdir(os.path.join(root, "audio_test")) \
        else "val"
    ds = LipDataset(root, mode, cfg)
    params, unet_p, unet_s, _ = init_models(cfg, ds)
    mgr = CheckpointManager(cfg["training"]["out_dir"])
    like = TrainState(params, unet_p, unet_s, None, jnp.int32(0))
    state, scalars = mgr.restore(like, name=None)
    if not scalars:
        print(f"WARNING: no checkpoint for {cfg_path} — serving RANDOM "
              "weights")
    return cfg, ds, state


def _audio_windows(path, cfg, ds_params):
    import numpy as np
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    from speech2lip_tpu.ops import audio_dsp
    wav = audio_dsp.load_wav(path)
    if cfg["model"].get("use_audio_mel"):
        mel = audio_dsp.melspectrogram(
            wav, fmin=cfg["data"].get("mel_fmin", 55.0)).T
        n = max(0, int((mel.shape[0] - 16) / 80.0 * 25.0) + 1)
        return np.stack([audio_dsp.crop_audio_window(mel, i + 2)
                         for i in range(n)]).astype(np.float32)
    if ds_params is None:
        raise ValueError(".wav request needs --deepspeech (or a "
                         "use_audio_mel identity)")
    from speech2lip_tpu.preprocess.audio_features import \
        wav_to_deepspeech_windows
    return np.asarray(wav_to_deepspeech_windows(wav, 16000, ds_params))


def main():
    from speech2lip_tpu.core.platform import apply_env_platform
    apply_env_platform()  # JAX_PLATFORMS honored despite sitecustomize
    ap = argparse.ArgumentParser(description="Serve trained identities.")
    ap.add_argument("configs", nargs="+")
    ap.add_argument("--queue", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--poll", type=float, default=0.5)
    ap.add_argument("--once", action="store_true")
    ap.add_argument("--deepspeech", type=str, default=None)
    ap.add_argument("--grace", type=float, default=0.0, help=(
        "skip queue files modified within this many seconds (guards "
        "against non-atomic client writes; 0 disables)"))
    ap.add_argument("--static", action="store_true", help=(
        "serve through the static-scene renderers (U-Net on the "
        "lip-window crop only; exact for the new-audio regime where every "
        "face artifact is a per-identity constant). Falls back per "
        "identity when no warp window exists."))
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np
    from speech2lip_tpu.core import checkpoint as ckpt
    from speech2lip_tpu.data.dataset import stack_batch
    from speech2lip_tpu.data.windows import cached_warp_window
    from speech2lip_tpu.infer.pipeline import MultiSpeakerServer
    from speech2lip_tpu.models import talking_face as tf

    identities = [_load_identity(c) for c in args.configs]
    cfg0 = identities[0][0]
    # the server compiles one program per lip-offset group with ONE static
    # window — validate a window per identity (each has its own coord
    # grids and lip box) and take the union, which stays valid for all
    windows = []
    for cfg_i, ds_i, _ in identities:
        win = cfg_i["data"].get("warp_window")
        if win is None:
            box = tf.expanded_lip_box(
                ds_i.lip_h, ds_i.lip_w, ds_i.lefttop_x, ds_i.lefttop_y,
                cfg_i["data"].get("expand_mask_divisor", 5))
            win = cached_warp_window(
                cfg_i["data"]["path"], box, ds_i.face_h, ds_i.face_w,
                ds_i.iter_coords)
        windows.append(tuple(win) if win is not None else None)
    if any(w is None for w in windows):
        window = None  # full-frame warp, always safe
    else:
        y0 = min(w[0] for w in windows)
        x0 = min(w[1] for w in windows)
        y1 = max(w[0] + w[2] for w in windows)
        x1 = max(w[1] + w[3] for w in windows)
        window = (y0, x0, y1 - y0, x1 - x0)
    server = MultiSpeakerServer(
        cfg0,
        [(st.params, st.unet_params, st.unet_state)
         for _, _, st in identities],
        [(ds.lefttop_x, ds.lefttop_y) for _, ds, _ in identities],
        window=tuple(window) if window is not None else None)
    bases = [ds.load_frame(0) for _, ds, _ in identities]
    static_renderers = None
    if args.static:
        from speech2lip_tpu.infer.static_scene import StaticSceneRenderer
        static_renderers = []
        for (cfg_i, ds_i, st_i), base_i, win_i in zip(identities, bases,
                                                      windows):
            if win_i is None or "coord" not in base_i:
                static_renderers.append(None)  # full path fallback
                continue
            static_renderers.append(StaticSceneRenderer(
                cfg_i, st_i.params, st_i.unet_params, st_i.unet_state,
                base_i, win_i, ds_i.lefttop_x, ds_i.lefttop_y))
        n_crop = sum(r is not None and r.geo is not None
                     for r in static_renderers)
        print(f"static-scene serving: {n_crop}/{len(identities)} "
              "identities on the windowed U-Net path")
    ds_params = None
    if args.deepspeech:
        ds_params, _ = ckpt.load_nested(args.deepspeech)

    os.makedirs(args.out, exist_ok=True)
    print(f"serving {len(identities)} identities from {args.queue}")

    fail_counts = {}

    def handle(fname):
        """Process one queue file.  Returns True when the file reached a
        terminal state (rendered, or failed twice and err'd); False when
        it was kept in the queue for one retry (transient/mid-write
        reads must not permanently drop a request)."""
        stem = os.path.splitext(fname)[0]
        ident_s, _, req = stem.partition("__")
        path = os.path.join(args.queue, fname)
        try:
            ident = int(ident_s)
            cfg, ds, _ = identities[ident]
            windows = _audio_windows(path, cfg, ds_params)
            req_dir = os.path.join(args.out, req)
            os.makedirs(req_dir, exist_ok=True)
            n = windows.shape[0]
            sr = (static_renderers[ident]
                  if static_renderers is not None else None)
            for start in range(0, n, args.batch):
                stop = min(start + args.batch, n)
                if sr is not None:
                    faces = np.asarray(sr(
                        windows[start:stop],
                        np.arange(start, stop, dtype=np.float32)))
                else:
                    samples = []
                    for i in range(start, stop):
                        s = dict(bases[ident])
                        s["audio"] = windows[i]
                        s["index"] = np.int32(i)
                        samples.append(s)
                    b = jax.tree.map(jnp.asarray, stack_batch(samples))
                    faces = np.asarray(server.render_fast(ident, b)["face"])
                for k, i in enumerate(range(start, stop)):
                    img = np.clip(faces[k] * 255.0, 0, 255).astype(np.uint8)
                    cv2.imwrite(os.path.join(req_dir, f"{i:05d}.jpg"),
                                img[:, :, ::-1])
            with open(os.path.join(args.out, req + ".done"), "w") as f:
                f.write(str(n))
            print(f"request {req}: {n} frames for identity {ident}")
            os.remove(path)
            fail_counts.pop(fname, None)
            return True
        except Exception as e:  # keep serving; retry once before dropping
            fail_counts[fname] = fail_counts.get(fname, 0) + 1
            if fail_counts[fname] < 2:
                print(f"request {req} failed ({e}); will retry")
                return False
            with open(os.path.join(args.out, req + ".err"), "w") as f:
                f.write(f"{type(e).__name__}: {e}")
            print(f"request {req} FAILED: {e}")
            if os.path.exists(path):
                os.remove(path)
            fail_counts.pop(fname, None)
            return True

    def _queue_files():
        return sorted(f for f in os.listdir(args.queue)
                      if f.endswith((".npy", ".wav")) and "__" in f)

    while True:
        now = time.time()
        pending = [f for f in _queue_files()
                   if args.grace <= 0 or now - os.path.getmtime(
                       os.path.join(args.queue, f)) >= args.grace]
        resolved = sum(handle(fname) for fname in pending)
        if args.once:
            # drain fully: failed-once files get their retry this pass;
            # stop when the queue is empty or nothing can make progress
            if not _queue_files() or (not resolved and not pending):
                break
            continue
        if not pending:
            time.sleep(args.poll)


if __name__ == "__main__":
    main()
