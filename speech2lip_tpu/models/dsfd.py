"""DSFD dual-shot face detector (ResNet-152 variant), functional JAX form.

The detector the reference actually builds for STEP1's face bboxes
(reference preprocess/detect_landmarks.py:38-40:
``face_detection.build_detector("DSFDDetector", confidence_threshold=.5,
nms_iou_threshold=.3)``).  The pip ``face_detection`` package wraps
Tencent's FaceDetection-DSFD ("DSFD: Dual Shot Face Detector", Li et al.
CVPR 2019): a ResNet-152 backbone, a product-merge low-level FPN over the
four backbone stages, a Feature Enhance Module (three stacked dilated-conv
branches) on each of the six detection sources, and SSD-style heads with a
max-out background on the stride-4 level.  Inference uses the second shot
(PAL2, the enhanced-feature heads) only, exactly as the pip package does.

Outputs (x1, y1, x2, y2, confidence) rows — the ``face_bbox_dict.npy``
contract (detect_landmarks.py:47-63).  Weights port from the package's
``WIDERFace_DSFD_RES152.pth`` via tools/convert_weights.py (kind 'dsfd');
random init preserves shapes for tests.  ``depths`` is configurable so
tests can run a shallow backbone with identical plumbing.

TPU notes: the whole feature extractor + heads is one jittable NHWC
program (convs on the MXU); only anchor decode + NMS run on the host, on
the handful of above-threshold rows.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from speech2lip_tpu.ops import nn as snn
from speech2lip_tpu.models.s3fd import nms  # same greedy NMS contract

RESNET152_DEPTHS = (3, 8, 36, 3)
_STAGE_CH = (256, 512, 1024, 2048)      # bottleneck out channels C2..C5
_STEPS = (4, 8, 16, 32, 64, 128)        # anchor strides of the 6 sources
_SIZES = (16, 32, 64, 128, 256, 512)    # PAL2 anchor sizes (px at 640 ref)
_FEM_CH = 512                           # every enhanced source is 512-ch
# ImageNet normalization (the pip package's image_mean/std, RGB)
_MEAN = jnp.array([123.0, 117.0, 104.0])
_STD = 1.0


def _conv_bn_init(key, cin, cout, k, dtype):
    p, s = snn.batchnorm_init(cout, dtype)
    return ({"conv": snn.conv2d_init(key, cin, cout, (k, k), bias=False,
                                     dtype=dtype), "bn": p}, {"bn": s})


def _cbr(params, state, x, stride=1, padding=0):
    x = snn.conv2d(params["conv"], x, stride=stride, padding=padding)
    x, _ = snn.batchnorm(params["bn"], state["bn"], x, train=False)
    return snn.relu(x)


def _bottleneck_init(key, cin, cmid, cout, downsample, dtype):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p1, s1 = _conv_bn_init(k1, cin, cmid, 1, dtype)
    p2, s2 = _conv_bn_init(k2, cmid, cmid, 3, dtype)
    p3, s3 = _conv_bn_init(k3, cmid, cout, 1, dtype)
    params = {"c1": p1, "c2": p2, "c3": p3}
    state = {"c1": s1, "c2": s2, "c3": s3}
    if downsample:
        pd, sd = _conv_bn_init(k4, cin, cout, 1, dtype)
        params["down"], state["down"] = pd, sd
    return params, state


def _bottleneck(params, state, x, stride):
    r = _cbr(params["c1"], state["c1"], x)
    r = _cbr(params["c2"], state["c2"], r, stride=stride, padding=1)
    r = snn.conv2d(params["c3"]["conv"], r)
    r, _ = snn.batchnorm(params["c3"]["bn"], state["c3"]["bn"], r, False)
    if "down" in params:
        x = snn.conv2d(params["down"]["conv"], x, stride=stride)
        x, _ = snn.batchnorm(params["down"]["bn"], state["down"]["bn"], x,
                             False)
    return snn.relu(x + r)


def _fem_init(key, cin, dtype):
    ks = jax.random.split(key, 5)
    return {
        # branch channel plan (Tencent FEM): 256 ⊕ 128 ⊕ 128 = 512
        "cpm1": snn.conv2d_init(ks[0], cin, 256, (3, 3), dtype=dtype),
        "cpm2": snn.conv2d_init(ks[1], cin, 256, (3, 3), dtype=dtype),
        "cpm3": snn.conv2d_init(ks[2], 256, 128, (3, 3), dtype=dtype),
        "cpm4": snn.conv2d_init(ks[3], 256, 128, (3, 3), dtype=dtype),
        "cpm5": snn.conv2d_init(ks[4], 128, 128, (3, 3), dtype=dtype),
    }


def _fem(params, x):
    """Feature Enhance Module: three progressively deeper dilated branches,
    channel-concatenated (DSFD §3.1)."""
    b1 = snn.relu(snn.conv2d(params["cpm1"], x, padding=1))
    mid = snn.relu(snn.conv2d(params["cpm2"], x, padding=2, dilation=2))
    b2 = snn.relu(snn.conv2d(params["cpm3"], mid, padding=1))
    mid2 = snn.relu(snn.conv2d(params["cpm4"], mid, padding=2, dilation=2))
    b3 = snn.relu(snn.conv2d(params["cpm5"], mid2, padding=1))
    return jnp.concatenate([b1, b2, b3], axis=-1)


def init(key, depths: Sequence[int] = RESNET152_DEPTHS, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 32 + sum(depths)))
    params, state = {}, {}
    p, s = _conv_bn_init(next(keys), 3, 64, 7, dtype)
    params["stem"], state["stem"] = p, s
    cin = 64
    for li, (n, cout) in enumerate(zip(depths, _STAGE_CH)):
        blocks_p, blocks_s = [], []
        for bi in range(n):
            bp, bs = _bottleneck_init(next(keys), cin if bi == 0 else cout,
                                      cout // 4, cout, bi == 0, dtype)
            blocks_p.append(bp)
            blocks_s.append(bs)
            cin = cout
        params[f"layer{li + 1}"] = blocks_p
        state[f"layer{li + 1}"] = blocks_s
    # extra downsample stages beyond C5 (pip face_ssd layer5/layer6)
    for name, c1, c2, c3 in (("layer5", 2048, 512, 512),
                             ("layer6", 512, 128, 256)):
        pa, sa = _conv_bn_init(next(keys), c1, c2, 1, dtype)
        pb, sb = _conv_bn_init(next(keys), c2, c3, 3, dtype)
        params[name] = {"a": pa, "b": pb}
        state[name] = {"a": sa, "b": sb}
    # low-level FPN (product merge): lateral 1×1 from the stage above,
    # smooth 1×1 on the stage below
    for name, ci, co in (("lat3", 2048, 1024), ("lat2", 1024, 512),
                         ("lat1", 512, 256), ("smooth3", 1024, 1024),
                         ("smooth2", 512, 512), ("smooth1", 256, 256)):
        params[name] = snn.conv2d_init(next(keys), ci, co, (1, 1),
                                       dtype=dtype)
    src_ch = [256, 512, 1024, 2048, 512, 256]
    for i, cs in enumerate(src_ch):
        params[f"fem{i}"] = _fem_init(next(keys), cs, dtype)
        ncls = 4 if i == 0 else 2  # max-out background on stride-4 head
        params[f"cls{i}"] = snn.conv2d_init(next(keys), _FEM_CH, ncls,
                                            (3, 3), dtype=dtype)
        params[f"reg{i}"] = snn.conv2d_init(next(keys), _FEM_CH, 4, (3, 3),
                                            dtype=dtype)
    return params, state


def _upsample_product(top, lateral):
    """DSFD's FPN merge: bilinear-upsample the deeper map to the shallower
    one's spatial size and take the elementwise product (face_ssd.py's
    _upsample_product), not the usual FPN sum."""
    up = snn.upsample_bilinear(top, lateral.shape[1], lateral.shape[2])
    return up * lateral


def apply(params, state, x: jnp.ndarray
          ) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """x: [B, H, W, 3] RGB in [0, 255] → [(cls_prob [B,h,w,2],
    reg [B,h,w,4])] for the 6 PAL2 sources, stride 4…128."""
    h = (x - _MEAN) / _STD
    h = _cbr(params["stem"], state["stem"], h, stride=2, padding=3)
    h = snn.maxpool2d(jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)),
                              constant_values=-jnp.inf), 3, 2)
    feats = []
    for li in range(1, 5):
        for bi, (bp, bs) in enumerate(zip(params[f"layer{li}"],
                                          state[f"layer{li}"])):
            h = _bottleneck(bp, bs, h, 2 if (bi == 0 and li > 1) else 1)
        feats.append(h)
    c2, c3, c4, c5 = feats
    e5 = _cbr(params["layer5"]["a"], state["layer5"]["a"], h)
    e5 = _cbr(params["layer5"]["b"], state["layer5"]["b"], e5,
              stride=2, padding=1)
    e6 = _cbr(params["layer6"]["a"], state["layer6"]["a"], e5)
    e6 = _cbr(params["layer6"]["b"], state["layer6"]["b"], e6,
              stride=2, padding=1)
    lfpn3 = _upsample_product(snn.conv2d(params["lat3"], c5),
                              snn.conv2d(params["smooth3"], c4))
    lfpn2 = _upsample_product(snn.conv2d(params["lat2"], lfpn3),
                              snn.conv2d(params["smooth2"], c3))
    lfpn1 = _upsample_product(snn.conv2d(params["lat1"], lfpn2),
                              snn.conv2d(params["smooth1"], c2))
    sources = [lfpn1, lfpn2, lfpn3, c5, e5, e6]
    outs = []
    for i, f in enumerate(sources):
        f = _fem(params[f"fem{i}"], f)
        cls = snn.conv2d(params[f"cls{i}"], f, padding=1)
        reg = snn.conv2d(params[f"reg{i}"], f, padding=1)
        if i == 0:  # max-in-out: 3 background logits, keep the max
            bg = jnp.max(cls[..., :3], axis=-1, keepdims=True)
            cls = jnp.concatenate([bg, cls[..., 3:]], axis=-1)
        outs.append((jax.nn.softmax(cls, axis=-1), reg))
    return outs


def decode_detections(outs, threshold: float = 0.5,
                      variances=(0.1, 0.2)) -> np.ndarray:
    """Host-side SSD anchor decode (batch 1): center-size anchors of side
    ``_SIZES[k]`` on a ``_STEPS[k]`` grid, torch-SSD variance decode.
    Returns (x1, y1, x2, y2, conf) rows sorted by confidence."""
    boxes = []
    for (cls, reg), step, size in zip(outs, _STEPS, _SIZES):
        prob = np.asarray(cls)[0, :, :, 1]
        loc = np.asarray(reg)[0]
        ys, xs = np.nonzero(prob > threshold)
        for y, x in zip(ys, xs):
            acx, acy = (x + 0.5) * step, (y + 0.5) * step
            dx, dy, dw, dh = loc[y, x]
            cx = acx + dx * variances[0] * size
            cy = acy + dy * variances[0] * size
            w = size * np.exp(dw * variances[1])
            hh = size * np.exp(dh * variances[1])
            boxes.append([cx - w / 2, cy - hh / 2, cx + w / 2,
                          cy + hh / 2, prob[y, x]])
    if not boxes:
        return np.zeros((0, 5), np.float32)
    boxes = np.asarray(boxes, np.float32)
    return boxes[np.argsort(-boxes[:, 4])]


def detect_faces(params, state, image: jnp.ndarray, threshold: float = 0.5,
                 nms_iou: float = 0.3, apply_fn=None) -> np.ndarray:
    """[H, W, 3] RGB in [0, 255] → [N, 5] (x1,y1,x2,y2,conf) boxes, the
    reference's build_detector thresholds (detect_landmarks.py:38-40).

    ``apply_fn`` lets per-frame callers pass ``jax.jit(apply)`` built once
    outside the loop (the un-jitted ResNet-152 forward dispatches eagerly
    op-by-op otherwise)."""
    outs = (apply_fn or apply)(params, state, image[None])
    return nms(decode_detections(outs, threshold), nms_iou)
