"""S3FD single-shot face detector, functional JAX form.

TPU-native equivalent of the detector stage of the reference's STEP1
(reference preprocess/detect_landmarks.py:34-63 builds a DSFD detector for
``face_bbox_dict.npy``; the ``face_alignment`` package the same step uses
for landmark crops ships S3FD).  This is the S3FD architecture ("Single
Shot Scale-invariant Face Detector", Zhang et al.): VGG-16 backbone, dilated
fc6/fc7 convs, two extra strided stages, L2-normalized shallow sources,
max-out background on the stride-4 head, SSD-style anchor decoding + NMS.

Outputs (x1, y1, x2, y2, confidence) boxes — the face_bbox_dict contract.
Weights port from face_alignment's ``s3fd`` checkpoint via
tools/convert_weights.py (kind 's3fd').
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from speech2lip_tpu.ops import nn as snn

# (name, cin, cout, kernel, stride, padding) backbone convs; 'M' = maxpool
_VGG = [
    ("conv1_1", 3, 64), ("conv1_2", 64, 64), "M",
    ("conv2_1", 64, 128), ("conv2_2", 128, 128), "M",
    ("conv3_1", 128, 256), ("conv3_2", 256, 256), ("conv3_3", 256, 256), "M",
    ("conv4_1", 256, 512), ("conv4_2", 512, 512), ("conv4_3", 512, 512), "M",
    ("conv5_1", 512, 512), ("conv5_2", 512, 512), ("conv5_3", 512, 512), "M",
]
_SOURCES = ["conv3_3", "conv4_3", "conv5_3", "fc7", "conv6_2", "conv7_2"]
_STRIDES = [4, 8, 16, 32, 64, 128]
_ANCHOR_SIZES = [16, 32, 64, 128, 256, 512]
_L2_SCALES = {"conv3_3": 10.0, "conv4_3": 8.0, "conv5_3": 5.0}
# RGB mean subtraction used by face_alignment's s3fd
_MEAN = jnp.array([104.0, 117.0, 123.0])  # BGR order


def init(key, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 64))
    params = {}
    for item in _VGG:
        if item == "M":
            continue
        name, cin, cout = item
        params[name] = snn.conv2d_init(next(keys), cin, cout, (3, 3),
                                       bias=True, dtype=dtype)
    params["fc6"] = snn.conv2d_init(next(keys), 512, 1024, (3, 3),
                                    bias=True, dtype=dtype)
    params["fc7"] = snn.conv2d_init(next(keys), 1024, 1024, (1, 1),
                                    bias=True, dtype=dtype)
    params["conv6_1"] = snn.conv2d_init(next(keys), 1024, 256, (1, 1),
                                        bias=True, dtype=dtype)
    params["conv6_2"] = snn.conv2d_init(next(keys), 256, 512, (3, 3),
                                        bias=True, dtype=dtype)
    params["conv7_1"] = snn.conv2d_init(next(keys), 512, 128, (1, 1),
                                        bias=True, dtype=dtype)
    params["conv7_2"] = snn.conv2d_init(next(keys), 128, 256, (3, 3),
                                        bias=True, dtype=dtype)
    for s in _L2_SCALES:
        params[s + "_l2"] = {"scale": jnp.full(
            (params[s]["w"].shape[-1],), _L2_SCALES[s], dtype)}
    src_ch = {"conv3_3": 256, "conv4_3": 512, "conv5_3": 512, "fc7": 1024,
              "conv6_2": 512, "conv7_2": 256}
    for i, s in enumerate(_SOURCES):
        ncls = 4 if i == 0 else 2  # max-out background on the first head
        params[f"cls_{s}"] = snn.conv2d_init(next(keys), src_ch[s], ncls,
                                             (3, 3), bias=True, dtype=dtype)
        params[f"reg_{s}"] = snn.conv2d_init(next(keys), src_ch[s], 4,
                                             (3, 3), bias=True, dtype=dtype)
    return params


def _l2norm(x, scale, eps=1e-10):
    n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True)) + eps
    return x / n * scale


def apply(params, x: jnp.ndarray) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """x: [B, H, W, 3] RGB in [0, 255] -> [(cls_prob [B,h,w,2],
    reg [B,h,w,4])] per source scale."""
    # BGR + mean subtraction (face_alignment preprocessing)
    x = x[..., ::-1] - _MEAN
    feats = {}
    h = x
    for item in _VGG:
        if item == "M":
            h = snn.maxpool2d(h, 2)
            continue
        name = item[0]
        h = snn.relu(snn.conv2d(params[name], h, padding=1))
        feats[name] = h
    h = snn.relu(snn.conv2d(params["fc6"], h, padding=3))
    # fc6 uses padding 3 with k3 (effectively dilation-like receptive field)
    h = snn.relu(snn.conv2d(params["fc7"], h, padding=0))
    feats["fc7"] = h
    h = snn.relu(snn.conv2d(params["conv6_1"], h, padding=0))
    h = snn.relu(snn.conv2d(params["conv6_2"], h, stride=2, padding=1))
    feats["conv6_2"] = h
    h = snn.relu(snn.conv2d(params["conv7_1"], h, padding=0))
    h = snn.relu(snn.conv2d(params["conv7_2"], h, stride=2, padding=1))
    feats["conv7_2"] = h

    outs = []
    for i, s in enumerate(_SOURCES):
        f = feats[s]
        if s in _L2_SCALES:
            f = _l2norm(f, params[s + "_l2"]["scale"])
        cls = snn.conv2d(params[f"cls_{s}"], f, padding=1)
        reg = snn.conv2d(params[f"reg_{s}"], f, padding=1)
        if i == 0:  # max-out of 3 background channels (S3FD §3.3)
            bg = jnp.max(cls[..., :3], axis=-1, keepdims=True)
            cls = jnp.concatenate([bg, cls[..., 3:]], axis=-1)
        cls = jax.nn.softmax(cls, axis=-1)
        outs.append((cls, reg))
    return outs


def decode_detections(outs, threshold: float = 0.5,
                      variances=(0.1, 0.2)) -> np.ndarray:
    """SSD anchor decode on the host: [(x1, y1, x2, y2, conf)] sorted by
    confidence (before NMS).  Batch size must be 1."""
    boxes = []
    for (cls, reg), stride, size in zip(outs, _STRIDES, _ANCHOR_SIZES):
        prob = np.asarray(cls)[0, :, :, 1]
        loc = np.asarray(reg)[0]
        ys, xs = np.nonzero(prob > threshold)
        for y, x in zip(ys, xs):
            acx, acy = (x + 0.5) * stride, (y + 0.5) * stride
            dx, dy, dw, dh = loc[y, x]
            cx = acx + dx * variances[0] * size
            cy = acy + dy * variances[0] * size
            w = size * np.exp(dw * variances[1])
            hh = size * np.exp(dh * variances[1])
            boxes.append([cx - w / 2, cy - hh / 2, cx + w / 2, cy + hh / 2,
                          prob[y, x]])
    if not boxes:
        return np.zeros((0, 5), np.float32)
    boxes = np.asarray(boxes, np.float32)
    return boxes[np.argsort(-boxes[:, 4])]


def nms(boxes: np.ndarray, iou_threshold: float = 0.3) -> np.ndarray:
    """Greedy non-maximum suppression on (x1,y1,x2,y2,conf) rows."""
    keep = []
    remaining = list(range(len(boxes)))
    while remaining:
        i = remaining.pop(0)
        keep.append(i)
        bi = boxes[i]
        area_i = (bi[2] - bi[0]) * (bi[3] - bi[1])
        still = []
        for j in remaining:
            bj = boxes[j]
            ix1, iy1 = max(bi[0], bj[0]), max(bi[1], bj[1])
            ix2, iy2 = min(bi[2], bj[2]), min(bi[3], bj[3])
            inter = max(0, ix2 - ix1) * max(0, iy2 - iy1)
            area_j = (bj[2] - bj[0]) * (bj[3] - bj[1])
            iou = inter / max(area_i + area_j - inter, 1e-9)
            if iou <= iou_threshold:
                still.append(j)
        remaining = still
    return boxes[keep]


def detect_faces(params, image: jnp.ndarray, threshold: float = 0.5,
                 nms_iou: float = 0.3) -> np.ndarray:
    """[H, W, 3] RGB in [0,255] -> [N, 5] (x1,y1,x2,y2,conf) boxes."""
    outs = apply(params, image[None])
    boxes = decode_detections(outs, threshold)
    return nms(boxes, nms_iou)
