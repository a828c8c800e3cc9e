#!/usr/bin/env python
"""Per-component render profile at May geometry (informational; bench.py
is the driver's headline metric).

Times each serving-pipeline stage as its own jitted program with a host
readback for synchronization (block_until_ready does not block under
tunneled backends, and eager ops on results would each compile through
the remote relay — keep every measured op inside the jit).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _t20(f, *a, n=20):
    import numpy as np
    import jax
    np.asarray(jax.device_get(f(*a)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*a)
        np.asarray(jax.device_get(r))
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from speech2lip_tpu.core.config import default_config
    from speech2lip_tpu.data.synthetic import synthetic_batch
    from speech2lip_tpu.data.windows import compute_warp_window
    from speech2lip_tpu.infer.renderer import (render_face_batch,
                                               render_lip_batch)
    from speech2lip_tpu.models import talking_face as tf
    from speech2lip_tpu.models import unet_light

    on_tpu = jax.default_backend() not in ("cpu",)
    B = 32 if on_tpu else 2
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    face, lip_h, lip_w = 500, 80, 120
    cfg = default_config()
    cfg["model"]["canonical_depth_height"] = face
    cfg["model"]["canonical_depth_width"] = face
    raw, geo = synthetic_batch(B, face=face, lip_h=lip_h, lip_w=lip_w)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = tf.init(k1, cfg)
    up, us = unet_light.init(k2)
    box = tf.expanded_lip_box(lip_h, lip_w, geo["lip_x"], geo["lip_y"])
    window = compute_warp_window(
        [raw["coord"][i] for i in range(B)], box, face, face, margin=16)
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, t)
    pc, upc, usc = cast(params), cast(up), cast(us)
    dev = jax.tree.map(jnp.asarray, raw)

    full = jax.jit(functools.partial(
        render_face_batch, lip_x=geo["lip_x"], lip_y=geo["lip_y"],
        lip_h=lip_h, lip_w=lip_w, window=window, use_pallas=on_tpu,
        compute_dtype=dt))
    t_full = _t20(lambda: full(pc, upc, usc, dev)["face"][0, 0, 0])

    t_mlp = _t20(jax.jit(
        lambda p, aud, idx: render_lip_batch(
            p, aud, idx, lip_h, lip_w, use_pallas=on_tpu,
            compute_dtype=dt)[0, 0, 0, 0]),
        pc, dev["audio"], dev["index"].astype(jnp.float32))

    lipimg = jnp.zeros((B, lip_h, lip_w, 3), dt)
    t_comp = _t20(jax.jit(
        lambda lip, fz, fo, m, co: tf.post_fusion_composite(
            lip, fz, fo, m, co, geo["lip_x"], geo["lip_y"],
            window=tuple(window), use_pallas=on_tpu)[0][0, 0, 0, 0]),
        lipimg, dev["rgb_face_zero"].astype(dt),
        dev["rgb_face_ori"].astype(dt),
        dev["mask_lip_canonical"].astype(dt), dev["coord"])

    xin = jnp.zeros((B, face, face, 3), dt)
    unet_fn = (unet_light.apply_infer_fused if on_tpu
               else lambda p, s, x: unet_light.apply(p, s, x,
                                                     train=False)[0])
    t_unet = _t20(jax.jit(
        lambda p, s, x: unet_fn(p, s, x)[0, 0, 0, 0]), upc, usc, xin)
    t_unet_xla = _t20(jax.jit(
        lambda p, s, x: unet_light.apply(p, s, x, train=False)[0]
        [0, 0, 0, 0]), upc, usc, xin)

    print(f"# batch {B}, {jnp.dtype(dt).name}, backend "
          f"{jax.default_backend()}")
    print(f"full render   : {t_full:7.2f} ms/batch "
          f"({B / t_full * 1e3:6.1f} fps)")
    print(f"  lip MLP     : {t_mlp:7.2f} ms")
    print(f"  composite   : {t_comp:7.2f} ms")
    print(f"  U-Net       : {t_unet:7.2f} ms  (XLA graph: "
          f"{t_unet_xla:.2f} ms)")


if __name__ == "__main__":
    main()
