#!/usr/bin/env python
"""Micro-benchmark: bilinear-sampling strategies for the canonical-depth
photometric warp (train_step.py) at May scale.

The warp samples [B, 500, 500, 3] sources at ~250k grid points per frame
whose coordinates depend on the LEARNED depth (so, unlike the blackaug
warps, it cannot move to the host loader).  XLA lowers the 4-neighbor
take_along_axis gathers to a slow serialized path (~8 ms/frame was
attributed to this in the batch-8 step); the one-hot MXU route used for
small warp windows is HBM-catastrophic at this P ([B, P, W*C] = 1.4
GB/frame — measured OOM at batch 8).  This tool times the candidate
formulations fwd and fwd+bwd so the train-step default is chosen by
measurement:

  tla      4x take_along_axis on [B, HW, C]   (grid_sample today)
  flatc    4x flat gather on [B*HW*C] with fused channel offset
  pad8     4x take_along_axis on [B, HW, 8]-padded source (sublane-
           aligned rows; 2.7x bandwidth waste but contiguous slices)
  onehot   two-stage one-hot MXU contractions (grid_sample_onehot_border)

Usage: python tools/bench_gather.py [--batch 8] [--dtype bf16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from speech2lip_tpu.ops.grid_sample import (grid_sample,
                                                grid_sample_onehot_border)

    b, h, w, c = args.batch, 500, 500, 3
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(0, 1, (b, h, w, c)), dt)
    # near-identity warp grid, like a real small head-pose delta
    ys, xs = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w),
                         indexing="ij")
    grid = np.stack([xs, ys], -1)[None] + 0.01 * rng.standard_normal(
        (b, h, w, 2))
    grid = jnp.asarray(grid.reshape(b, h * w, 2), dt)

    def unnorm(g):
        ix = jnp.clip(((g[..., 0] + 1.0) * w - 1.0) * 0.5, 0.0, w - 1.0)
        iy = jnp.clip(((g[..., 1] + 1.0) * h - 1.0) * 0.5, 0.0, h - 1.0)
        x0 = jnp.clip(jnp.floor(ix).astype(jnp.int32), 0, w - 2)
        y0 = jnp.clip(jnp.floor(iy).astype(jnp.int32), 0, h - 2)
        return ix, iy, x0, y0

    def tla(s, g):
        return grid_sample(s, g.reshape(b, h, w, 2),
                           padding_mode="border").reshape(b, h * w, c)

    def flatc(s, g):
        ix, iy, x0, y0 = unnorm(g)
        wx = (ix - x0.astype(ix.dtype))[..., None]
        wy = (iy - y0.astype(iy.dtype))[..., None]
        flat = s.reshape(b, h * w * c)

        def take(yi, xi):
            base = (yi * w + xi) * c
            idx = base[..., None] + jnp.arange(c)[None, None, :]
            return jnp.take_along_axis(flat[:, :, None],
                                       idx.reshape(b, -1, 1), axis=1
                                       ).reshape(b, -1, c)

        v00 = take(y0, x0)
        v01 = take(y0, x0 + 1)
        v10 = take(y0 + 1, x0)
        v11 = take(y0 + 1, x0 + 1)
        top = v00 * (1 - wx) + v01 * wx
        bot = v10 * (1 - wx) + v11 * wx
        return top * (1 - wy) + bot * wy

    def pad8(s, g):
        ix, iy, x0, y0 = unnorm(g)
        wx = (ix - x0.astype(ix.dtype))[..., None]
        wy = (iy - y0.astype(iy.dtype))[..., None]
        sp = jnp.pad(s, ((0, 0), (0, 0), (0, 0), (0, 8 - c))
                     ).reshape(b, h * w, 8)

        def take(yi, xi):
            idx = (yi * w + xi)[..., None]
            return jnp.take_along_axis(sp, idx, axis=1)[..., :c]

        v00 = take(y0, x0)
        v01 = take(y0, x0 + 1)
        v10 = take(y0 + 1, x0)
        v11 = take(y0 + 1, x0 + 1)
        top = v00 * (1 - wx) + v01 * wx
        bot = v10 * (1 - wx) + v11 * wx
        return top * (1 - wy) + bot * wy

    def onehot(s, g):
        return grid_sample_onehot_border(s, g)

    variants = [("tla", tla), ("flatc", flatc), ("pad8", pad8)]
    # the one-hot route's [B, P, W*C] intermediate: only runnable when it
    # fits HBM with headroom (1.45 GB/frame at 500² f32)
    if b * h * w * w * c * src.dtype.itemsize < 4e9:
        variants.append(("onehot", onehot))
    else:
        print("# onehot skipped: [B,P,W*C] intermediate exceeds HBM budget",
              flush=True)

    # correctness pin vs tla first
    ref = np.asarray(jax.jit(tla)(src, grid), np.float32)
    for name, fn in variants[1:]:
        out = np.asarray(jax.jit(fn)(src, grid), np.float32)
        err = np.abs(out - ref).max()
        tol = 2e-2 if args.dtype == "bf16" else 1e-5
        status = "ok" if err < tol else f"MISMATCH {err:.2e}"
        print(f"# parity {name}: {status}", flush=True)

    def bench(fn):
        # scalar outputs: the only reliable sync under the axon tunnel is a
        # host readback, and it must be of a jit-produced scalar (eager ops
        # on device arrays relay-compile fresh programs).
        f = jax.jit(lambda s, g: fn(s, g).sum())

        def g_loss(s, g):
            return (fn(s, g) ** 2).sum()

        # grid-only gradient: in the canonical-depth loss the SOURCE is a
        # batch input (no grad), only the grid (via the learned depth)
        # needs one — and d/d_src would be a 250k-point scatter-add, the
        # slowest path on TPU (measured 47 ms/frame extra).
        g_raw = jax.grad(g_loss, argnums=1)
        fb = jax.jit(lambda s, g: jnp.sum(g_raw(s, g)))

        def time_it(callable_, n):
            float(callable_())
            t0 = time.perf_counter()
            for _ in range(n):
                r = callable_()
            _ = float(r)
            return (time.perf_counter() - t0) / n

        t_f = time_it(lambda: f(src, grid), args.iters)
        t_fb = time_it(lambda: fb(src, grid), args.iters)
        return t_f, t_fb

    for name, fn in variants:
        try:
            t_f, t_fb = bench(fn)
            print(f"{name:7s}: fwd {t_f*1e3:7.2f} ms ({t_f*1e3/b:6.2f} "
                  f"ms/frame) | fwd+bwd {t_fb*1e3:7.2f} ms "
                  f"({t_fb*1e3/b:6.2f} ms/frame)", flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name:7s}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
