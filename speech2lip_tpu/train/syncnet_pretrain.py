"""Train a SyncNet lip-sync expert on one identity's ground-truth frames.

The reference consumes a pretrained Wav2Lip expert (``lipsync_expert.pth``,
loaded frozen as the sync-loss teacher — reference training.py:83-95) and
never ships the code that produced it; users without that artifact cannot
run the sync stage meaningfully.  This module closes the gap the framework
way: it re-derives the expert ON the identity being trained, with the same
``SyncNet_color`` architecture (models/syncnet.py) and the same cosine-BCE
contrastive objective the sync stage itself uses
(reference training.py:517-557) — positives are (mel window, the 5-frame
ground-truth face window it voices), negatives pair the same faces with a
mel window from elsewhere in the clip.

Everything is one jitted TPU program per step: window gathers are
``jnp.take`` over device-resident arrays (the whole identity fits in HBM at
96² teacher resolution), so the loop is MXU-bound conv work, not host IO.

Face windows are built exactly like the student's positive branch
(train/train_step.py sync section): the canonical ``face_bbox`` crop,
resized to 96², RGB→BGR, lower half, 5 frames stacked along channels
(losses.sync_window_to_syncnet_input).  Only TRAIN-split frames are used,
so a val-split sync confidence scored against this teacher measures
generalization, not teacher memorization.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

__all__ = ["build_sync_arrays", "pretrain_teacher"]


def build_sync_arrays(cfg: Dict) -> Tuple[np.ndarray, np.ndarray]:
    """(windows [W, 48, 96, 15], mels [W, 80, 16]) from the train split.

    Window w covers frames w..w+4 of ``ori_images_face`` (face_bbox crop →
    96² resize, BGR lower half, frame-major channel stack) and the mel
    window centered at frame w+2 — the dataset's sync-extras geometry
    (data/dataset._sync_extras, reference someones_lip_dataset.py:328-385).
    """
    import cv2

    from speech2lip_tpu.ops import audio_dsp

    d = cfg["data"]
    root = d["path"]
    faces_dir = os.path.join(root, "ori_images_face")
    files = sorted(f for f in os.listdir(faces_dir)
                   if f.endswith(d.get("extension", ".jpg")))
    n_val = int(d.get("val_split_frames", 0))
    files = files[: len(files) - n_val] if n_val else files

    bbox = None
    bbox_path = os.path.join(root, "face_bbox_dict.npy")
    if os.path.exists(bbox_path):
        bd = np.load(bbox_path, allow_pickle=True).item()
        key = "{:05d}.jpg".format(int(d.get("canonical_idx", 0)) + 1)
        if key in bd:
            bbox = [int(v) for v in bd[key][:4]]

    frames = []
    for f in files:
        img = cv2.imread(os.path.join(faces_dir, f))  # BGR uint8
        if bbox is not None:
            x, y, x2, y2 = bbox
            img = img[y:y2, x:x2]
        frames.append(cv2.resize(img, (96, 96)).astype(np.float32) / 255.0)
    frames = np.stack(frames)  # [N, 96, 96, 3] BGR

    wav = audio_dsp.load_wav(os.path.join(root, "audio", "audio.wav"))
    mel = audio_dsp.melspectrogram(
        wav, fmin=d.get("mel_fmin", 55.0)).T  # [T, 80]

    n_win = len(frames) - 4
    windows, mels = [], []
    for i in range(n_win):
        win = frames[i:i + 5, 48:, :, :]  # lower half, already BGR
        # frame-major channel stack -> [48, 96, 15]
        windows.append(win.transpose(1, 2, 0, 3).reshape(48, 96, 15))
        mels.append(audio_dsp.crop_audio_window(mel, i + 2).T)  # [80, 16]
    return (np.stack(windows).astype(np.float32),
            np.stack(mels).astype(np.float32))


def pretrain_teacher(cfg: Dict, steps: int = 400, batch: int = 16,
                     lr: float = 1e-4, seed: int = 0,
                     log_every: int = 50, log=print):
    """Train the expert; returns ((params, state), loss_history).

    The returned tuple is ``checkpoint.save``-compatible with what the
    sync stage (train_step frozen['syncnet']) and ``cli.evaluate --sync``
    load, so one artifact serves training and scoring.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from speech2lip_tpu.models import syncnet as syncnet_mod
    from speech2lip_tpu.train import losses

    windows_np, mels_np = build_sync_arrays(cfg)
    n = len(windows_np)
    if n < 7:
        # the negative-sampling guarantee below ("off by >= 3 frames") needs
        # shift in [3, n-3] to survive the mod-n wrap on BOTH sides; with
        # n <= 6 a wrapped "negative" mel can land 1-2 frames from the
        # positive, i.e. nearly identical audio labeled 0 (ADVICE r4)
        raise ValueError(
            f"need >= 7 sync windows for >=3-frame negative sampling, got "
            f"{n}; provide a longer clip or lower the sync window stride")

    windows = jnp.asarray(windows_np)
    mels = jnp.asarray(mels_np)[..., None]  # [W, 80, 16, 1]

    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    params, state = syncnet_mod.init(init_key)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p, s, face_idx, mel_idx, y):
        g = jnp.take(windows, face_idx, axis=0)
        m = jnp.take(mels, mel_idx, axis=0)
        # BN in train mode: batch stats + running-stat update, like the
        # torch expert's training loop
        a, v, new_s = syncnet_mod.apply(p, s, m, g, train=True)
        return losses.cosine_bce_loss(a, v, y), new_s

    @jax.jit
    def step(p, s, o, k):
        k1, k2 = jax.random.split(k)
        pos = jax.random.randint(k1, (batch,), 0, n)
        # negative mel: a different window, uniformly off by >=3 frames in
        # BOTH mod-n directions (shift in [3, n-4], so min(shift, n-shift)
        # >= 3) — adjacent (nearly identical) audio can't be a "negative"
        shift = jax.random.randint(k2, (batch,), 3, n - 3)
        neg_mel = jnp.mod(pos + shift, n)
        face_idx = jnp.concatenate([pos, pos])
        mel_idx = jnp.concatenate([pos, neg_mel])
        y = jnp.concatenate([jnp.ones((batch,)), jnp.zeros((batch,))])
        (l, new_s), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, s, face_idx, mel_idx, y)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), new_s, o, l

    history: List[float] = []
    for it in range(steps):
        key, k = jax.random.split(key)
        params, state, opt_state, l = step(params, state, opt_state, k)
        if it % log_every == 0 or it == steps - 1:
            lv = float(l)
            history.append(lv)
            log(f"[syncnet-pretrain] step {it}/{steps} bce={lv:.4f}")
    return (params, state), history
