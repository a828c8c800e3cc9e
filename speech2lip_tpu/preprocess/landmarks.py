"""STEP1: landmark detection + face bboxes.

TPU-native equivalent of the reference's detect_landmarks.py:9-63, which
runs the ``face_alignment`` (FAN) and ``face_detection`` (DSFD) CUDA-torch
packages and writes per-frame 68×2 ``.lms`` text files plus
``face_bbox_dict.npy``.

Here: the FAN port (models/fan.py, jitted) detects landmarks on a 256²
face-centered crop; the bbox comes either from a caller-supplied detector
or from the BiSeNet parsing map (the face-region bounding box — a
deterministic, dependency-free stand-in for DSFD, adequate for the fixed
500² face crops this pipeline consumes).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def bbox_from_parsing(class_map: np.ndarray,
                      face_classes=tuple(range(1, 16))) -> Tuple[int, int, int, int]:
    """Face bbox (x, y, x2, y2) from a BiSeNet class map ([H, W] ints);
    classes 1..15 cover the face/head regions in the 19-class scheme."""
    mask = np.isin(class_map, face_classes)
    if not mask.any():
        h, w = class_map.shape
        return 0, 0, w, h
    ys, xs = np.nonzero(mask)
    return int(xs.min()), int(ys.min()), int(xs.max()) + 1, int(ys.max()) + 1


def _crop_resize(img: np.ndarray, bbox, out: int = 256):
    """Square crop around the bbox center (face_alignment's crop geometry:
    scale ~1.9× bbox size), bilinear resize to 256².  Returns (crop, affine
    (scale, x0, y0)) mapping crop pixels back to image pixels."""
    import cv2
    x0, y0, x1, y1 = bbox
    cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
    size = max(x1 - x0, y1 - y0) * 1.3
    half = size / 2.0
    sx0, sy0 = cx - half, cy - half
    m = np.float32([[out / size, 0, -sx0 * out / size],
                    [0, out / size, -sy0 * out / size]])
    crop = cv2.warpAffine(img, m, (out, out), flags=cv2.INTER_LINEAR)
    return crop, (size / out, sx0, sy0)


def detect_landmarks(fan_params, fan_state, image: np.ndarray,
                     bbox, apply_fn=None) -> np.ndarray:
    """[H, W, 3] float RGB in [0,1] + face bbox -> [68, 2] landmarks in
    image pixels.  ``apply_fn``: optional pre-jitted ``fan.apply`` for
    per-frame loops."""
    from speech2lip_tpu.models import fan
    crop, (scale, x0, y0) = _crop_resize(image, bbox)
    heatmaps = (apply_fn or fan.apply)(fan_params, fan_state,
                                       jnp.asarray(crop)[None])[-1]
    pts = np.asarray(fan.decode_heatmaps(heatmaps))[0]  # 64×64 heatmap px
    pts = (pts + 0.5) * 4.0  # heatmap -> 256-crop pixels
    pts = pts * scale + np.array([x0, y0])
    return pts.astype(np.float32)


def run_step1(frames_dir: str, out_lms_dir: str, out_bbox_path: str,
              fan_params, fan_state, bisenet_params=None,
              bisenet_state=None, s3fd_params=None,
              dsfd=None) -> Dict[str, np.ndarray]:
    """Process a directory of frames → .lms files + face_bbox_dict.npy
    (the STEP1 artifact contract).

    Face bboxes come from (in preference order) the DSFD detector (the
    reference's own choice, detect_landmarks.py:38-40; pass a
    (params, state) pair), the S3FD detector, the BiSeNet parsing map, or
    the full frame."""
    import cv2
    os.makedirs(out_lms_dir, exist_ok=True)
    bbox_dict = {}
    files = sorted(f for f in os.listdir(frames_dir) if f.endswith(".jpg"))
    dsfd_apply = None
    if dsfd is not None:
        from speech2lip_tpu.models import dsfd as dsfd_mod
        dsfd_apply = jax.jit(dsfd_mod.apply)  # one compile for all frames
    for fname in files:
        img = cv2.cvtColor(cv2.imread(os.path.join(frames_dir, fname)),
                           cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        conf = 1.0  # fallback full-frame boxes carry confidence 1.0
        if dsfd is not None:
            dets = dsfd_mod.detect_faces(dsfd[0], dsfd[1],
                                         jnp.asarray(img * 255.0),
                                         apply_fn=dsfd_apply)
            if len(dets):
                bbox = tuple(int(v) for v in dets[0][:4])
                conf = float(dets[0][4])
            else:
                h, w = img.shape[:2]
                bbox = (0, 0, w, h)
        elif s3fd_params is not None:
            from speech2lip_tpu.models import s3fd
            dets = s3fd.detect_faces(s3fd_params,
                                     jnp.asarray(img * 255.0))
            if len(dets):
                bbox = tuple(int(v) for v in dets[0][:4])
                conf = float(dets[0][4])
            else:
                h, w = img.shape[:2]
                bbox = (0, 0, w, h)
        elif bisenet_params is not None:
            from speech2lip_tpu.models import bisenet
            classes = np.asarray(bisenet.parse_face(
                bisenet_params, bisenet_state, jnp.asarray(img)))
            import cv2 as _cv2
            classes = _cv2.resize(classes.astype(np.uint8), img.shape[1::-1],
                                  interpolation=_cv2.INTER_NEAREST)
            bbox = bbox_from_parsing(classes)
        else:
            h, w = img.shape[:2]
            bbox = (0, 0, w, h)
        lms = detect_landmarks(fan_params, fan_state, img, bbox)
        np.savetxt(os.path.join(out_lms_dir,
                                fname.replace(".jpg", ".lms")), lms)
        # full (x1,y1,x2,y2,conf) row, like the reference's face_bbox_dict
        # (detect_landmarks.py saves the detector's confidence column)
        bbox_dict[fname] = np.array([*bbox, conf], np.float32)
    np.save(out_bbox_path, bbox_dict, allow_pickle=True)
    return bbox_dict
