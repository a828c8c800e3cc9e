"""Synthetic artifact-tree generator.

Builds a tiny, fully self-consistent instance of the preprocessed dataset
contract (SURVEY.md §2.8) for tests and benchmarks: golden-file testing of
the reader, end-to-end train/infer smoke tests, and multi-chip dry runs —
the test seams the reference lacks entirely (SURVEY.md §4).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np


def make_synthetic_tree(root: str, n_frames: int = 12, face: int = 64,
                        lip_h: int = 16, lip_w: int = 24,
                        seed: int = 0, fps: int = 25,
                        sample_rate: int = 16000) -> Dict[str, Any]:
    """Write a miniature dataset tree under ``root``; returns its geometry."""
    import cv2
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "audio"), exist_ok=True)
    os.makedirs(os.path.join(root, "audio_test"), exist_ok=True)
    for d in ("images", "warp_images", "ori_images_face", "coords",
              "landmarks"):
        os.makedirs(os.path.join(root, d), exist_ok=True)

    # DeepSpeech windows [N, 16, 29]
    aud = rng.standard_normal((n_frames, 16, 29)).astype(np.float32)
    np.save(os.path.join(root, "audio", "audio.npy"), aud)
    np.save(os.path.join(root, "audio_test", "audio.npy"), aud[: n_frames // 2])

    # wav long enough for the mel windows: n_frames/fps seconds + pad
    dur = n_frames / fps + 1.0
    t = np.arange(int(dur * sample_rate)) / sample_rate
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    from scipy.io import wavfile
    wavfile.write(os.path.join(root, "audio", "audio.wav"), sample_rate,
                  (wav * 32767).astype(np.int16))
    half = len(wav) // 2
    wavfile.write(os.path.join(root, "audio_test", "audio.wav"),
                  sample_rate, (wav[:half] * 32767).astype(np.int16))

    # lip placed near the lower-middle of the face (kept in-bounds even
    # after the mouth-bbox center_y ratio shift)
    lip_x = (face - lip_w) // 2
    lip_y = min(int(face * 0.6), face - lip_h - 4)

    for i in range(n_frames):
        name = "{:05d}".format(i + 1)
        lip = (rng.uniform(0, 1, (lip_h, lip_w, 3)) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(root, "images", name + ".jpg"), lip)
        f = (rng.uniform(0, 1, (face, face, 3)) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(root, "warp_images", name + ".jpg"), f)
        cv2.imwrite(os.path.join(root, "ori_images_face", name + ".jpg"), f)
        # near-identity canonical→observed grid with small jitter
        ys, xs = np.meshgrid(np.linspace(-1, 1, face),
                             np.linspace(-1, 1, face), indexing="ij")
        jitter = 0.02 * rng.standard_normal((2,))
        coord = np.stack([xs + jitter[0], ys + jitter[1]], -1).astype(np.float32)
        np.save(os.path.join(root, "coords", name + ".npy"), coord)
        # 68 landmarks; mouth points (48+) spread over the lip box
        lms = rng.uniform(0, face, (68, 2)).astype(np.float32)
        gx = np.linspace(lip_x + 2, lip_x + lip_w - 2, 20)
        gy = np.linspace(lip_y + 2, lip_y + lip_h - 2, 20)
        lms[48:] = np.stack([gx, gy], -1)
        np.savetxt(os.path.join(root, "landmarks", name + ".lms"), lms)

    lip_mask = np.zeros((face, face, 3), np.uint8)
    lip_mask[lip_y:lip_y + lip_h, lip_x:lip_x + lip_w] = 255
    import cv2 as _cv2
    _cv2.imwrite(os.path.join(root, "canonical_lip_mask.jpg"), lip_mask)
    head = np.zeros((face, face, 3), np.uint8)
    head[4:-4, 4:-4] = 255
    _cv2.imwrite(os.path.join(root, "canonical_head_mask.jpg"), head)
    fmask = np.zeros((face, face, 3), np.uint8)
    fmask[8:-8, 8:-8] = 255
    _cv2.imwrite(os.path.join(root, "canonical_face_mask.jpg"), fmask)

    depth = rng.uniform(0.8, 1.2, (face, face)).astype(np.float32)
    depth[:4] = 0.0  # holes, exercising the hole-fill init
    np.save(os.path.join(root, "depth_face_canonical.npy"), depth)

    euler = (0.05 * rng.standard_normal((n_frames, 3))).astype(np.float32)
    trans = (0.05 * rng.standard_normal((n_frames, 3))).astype(np.float32)
    trans[:, 2] += 2.0
    np.savez(os.path.join(root, "track_params.pt.npz"),
             euler=euler, trans=trans, focal=np.float32(face * 2.0))

    bbox = {"{:05d}.jpg".format(i + 1):
            np.array([4, 4, face - 4, face - 4, 1.0], np.float32)
            for i in range(n_frames)}
    np.save(os.path.join(root, "face_bbox_dict.npy"), bbox, allow_pickle=True)

    return {"n_frames": n_frames, "face": face, "lip_h": lip_h,
            "lip_w": lip_w, "lip_x": lip_x, "lip_y": lip_y,
            "focal": face * 2.0}


def synthetic_batch(n: int, face: int = 64, lip_h: int = 32, lip_w: int = 32,
                    seed: int = 0, with_sync: bool = False,
                    total_frames: int = 100) -> Dict[str, Any]:
    """Build an in-memory training/inference batch of ``n`` frames with the
    full sample-dict contract (SURVEY.md §2.8) — no disk artifacts needed.
    Used by the multi-chip dry run and benchmarks."""
    rng = np.random.default_rng(seed)
    lip_x = (face - lip_w) // 2
    lip_y = min(int(face * 0.6), face - lip_h - 4)
    mask = np.zeros((n, face, face, 3), np.float32)
    mask[:, lip_y:lip_y + lip_h, lip_x:lip_x + lip_w] = 1.0
    ys, xs = np.meshgrid(np.linspace(-1, 1, face), np.linspace(-1, 1, face),
                         indexing="ij")
    coord = np.broadcast_to(
        np.stack([xs, ys], -1)[None], (n, face, face, 2)).astype(np.float32)
    head = np.zeros((n, face, face, 1), np.float32)
    head[:, 4:-4, 4:-4] = 1.0
    fmask = np.zeros((n, face, face, 3), np.float32)
    fmask[:, 8:-8, 8:-8] = 1.0
    batch = {
        "audio": rng.standard_normal((n, 16, 29)).astype(np.float32),
        "index": np.arange(n, dtype=np.int32),
        "total_frame": np.full((n,), total_frames, np.int32),
        "rgb": rng.uniform(0, 1, (n, lip_h, lip_w, 3)).astype(np.float32),
        "rgb_face_zero": rng.uniform(0, 1, (n, face, face, 3)).astype(np.float32),
        "rgb_face_ori": rng.uniform(0, 1, (n, face, face, 3)).astype(np.float32),
        "mask_lip_canonical": mask,
        "coord": coord + 0.01 * rng.standard_normal((n, 1, 1, 2)).astype(np.float32),
        "euler": (0.05 * rng.standard_normal((n, 3))).astype(np.float32),
        "trans": np.concatenate([
            0.05 * rng.standard_normal((n, 2)), 2 + 0.05 * rng.standard_normal((n, 1))],
            -1).astype(np.float32),
        "canonical_euler": np.zeros((n, 3), np.float32),
        "canonical_trans": np.tile(np.array([[0, 0, 2.0]], np.float32), (n, 1)),
        "mask_head_canonical": head,
        "mask_face_canonical": fmask,
    }
    if with_sync:
        batch.update({
            "mel": rng.standard_normal((n, 1, 80, 16)).astype(np.float32),
            "audio_window": rng.standard_normal((n, 5, 16, 29)).astype(np.float32),
            "coord_window": np.broadcast_to(
                coord[:, None], (n, 5, face, face, 2)).copy(),
            "rgb_window_neg": rng.uniform(0, 1, (n, 3, 5, 96, 96)).astype(np.float32),
        })
    geo = {"face": face, "lip_h": lip_h, "lip_w": lip_w,
           "lip_x": lip_x, "lip_y": lip_y, "focal": face * 2.0}
    return batch, geo


def synthetic_config(root: str, geo: Dict[str, Any]) -> Dict[str, Any]:
    """Config dict wired to a synthetic tree."""
    from speech2lip_tpu.core.config import default_config
    cfg = default_config()
    cfg["data"].update({
        "path": root,
        "width": geo["lip_w"],
        "height": geo["lip_h"],
        "face_img_focal": geo["focal"],
        "val_split_frames": max(1, geo["n_frames"] // 6),
    })
    cfg["model"].update({
        "canonical_depth_height": geo["face"],
        "canonical_depth_width": geo["face"],
        "canonical_depth_init_path": os.path.join(
            root, "depth_face_canonical.npy"),
    })
    cfg["training"]["batch_rays"] = geo["lip_h"] * geo["lip_w"]
    return cfg
